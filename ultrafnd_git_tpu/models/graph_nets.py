"""Edge-list GNNs via segment ops (the TPU equivalent of the PyG scaffold).

Parity target: reference `src/models/gnn/pyg_adapter.py` — an *optional*
torch-geometric scaffold with a stacked-SAGEConv `PostEncoder` and a
`HeteroFGHGNN` over a (posts, phrases, sources) hetero graph, both empty
placeholders when PyG is missing.

Rebuilt without any graph-library dependency: message passing is
jax.ops.segment_sum over static-shape edge index arrays (pad edges with a
sentinel row to keep shapes static under jit — standard TPU practice).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def pad_edges(
    senders: jnp.ndarray,
    receivers: jnp.ndarray,
    max_edges: int,
    num_nodes: int,
    num_receiver_nodes: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pad edge lists to a static size; padded edges point at ghost nodes.

    Hetero edges have DIFFERENT sender/receiver node counts — pass
    `num_receiver_nodes` so each endpoint gets its own ghost sentinel (a
    single sentinel valid for one side can alias a real node on the
    other, silently injecting messages).
    """
    e = senders.shape[0]
    if e > max_edges:
        raise ValueError(f"edge count {e} exceeds max_edges {max_edges}")
    if num_receiver_nodes is None:
        num_receiver_nodes = num_nodes
    pad = max_edges - e
    mask = jnp.concatenate([jnp.ones(e, bool), jnp.zeros(pad, bool)])
    s = jnp.concatenate([senders, jnp.full((pad,), num_nodes, senders.dtype)])
    r = jnp.concatenate(
        [receivers, jnp.full((pad,), num_receiver_nodes, receivers.dtype)]
    )
    return s, r, mask


def _neighbor_mean(
    x: jnp.ndarray, senders: jnp.ndarray, receivers: jnp.ndarray, num_nodes: int
) -> jnp.ndarray:
    """Mean of sender features per receiver (ghost node slot dropped)."""
    msgs = x[jnp.clip(senders, 0, num_nodes - 1)]
    valid = (senders < num_nodes)[:, None].astype(x.dtype)
    summed = jax.ops.segment_sum(
        msgs * valid, receivers, num_segments=num_nodes + 1
    )[:num_nodes]
    counts = jax.ops.segment_sum(
        valid, receivers, num_segments=num_nodes + 1
    )[:num_nodes]
    return summed / jnp.maximum(counts, 1.0)


class SAGELayer(nn.Module):
    """GraphSAGE-mean: h' = act(W_self x + W_nbr mean_{j in N(i)} x_j)."""

    out_dim: int
    act: bool = True

    @nn.compact
    def __call__(self, x, senders, receivers) -> jnp.ndarray:
        n = x.shape[0]
        nbr = _neighbor_mean(x, senders, receivers, n)
        h = nn.Dense(self.out_dim, name="self")(x) + nn.Dense(
            self.out_dim, name="nbr"
        )(nbr)
        return nn.relu(h) if self.act else h


class PostEncoder(nn.Module):
    """Stacked SAGE layers over post-post edges -> (N, out_dim) embeddings."""

    hid: int = 128
    out_dim: int = 128
    layers: int = 2

    @nn.compact
    def __call__(self, x, senders, receivers) -> jnp.ndarray:
        h = x
        for i in range(self.layers - 1):
            h = SAGELayer(self.hid, name=f"sage{i}")(h, senders, receivers)
        return SAGELayer(self.out_dim, act=False, name="sage_out")(
            h, senders, receivers
        )


class HeteroFGHGNN(nn.Module):
    """Hetero message passing over posts / phrases / sources node sets.

    Edge types: (post -uses-> phrase), (phrase -used_by-> post),
    (source -publishes-> post), (post -published_by-> source).
    Two rounds of typed aggregation; returns updated post embeddings.
    """

    hid: int = 128
    out_dim: int = 128
    rounds: int = 2

    @nn.compact
    def __call__(
        self,
        nodes: Dict[str, jnp.ndarray],
        edges: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
    ) -> Dict[str, jnp.ndarray]:
        """nodes: {"posts": (P,D), "phrases": (H,D'), "sources": (S,D'')}
        edges: {"post_phrase": (senders into posts, receivers into phrases),
                "source_post": (senders into sources, receivers into posts)}
        """
        posts = nn.Dense(self.hid, name="embed_posts")(nodes["posts"])
        phrases = nn.Dense(self.hid, name="embed_phrases")(nodes["phrases"])
        sources = nn.Dense(self.hid, name="embed_sources")(nodes["sources"])

        pp_s, pp_r = edges["post_phrase"]  # post idx -> phrase idx
        sp_s, sp_r = edges["source_post"]  # source idx -> post idx

        def typed_sum(x, senders, receivers, n_send, n_recv):
            """Masked typed aggregation: sentinel-padded edges (sender >=
            n_send or receiver >= n_recv) contribute nothing — clip-only
            gathering would alias ghost edges onto real nodes."""
            valid = (
                (senders < n_send) & (receivers < n_recv)
            )[:, None].astype(x.dtype)
            msgs = x[jnp.clip(senders, 0, n_send - 1)] * valid
            return jax.ops.segment_sum(
                msgs,
                jnp.clip(receivers, 0, n_recv),
                num_segments=n_recv + 1,
            )[:n_recv]

        n_p, n_h, n_s = posts.shape[0], phrases.shape[0], sources.shape[0]
        for i in range(self.rounds):
            # phrases aggregate from posts that use them
            phr_in = typed_sum(posts, pp_s, pp_r, n_p, n_h)
            phrases = nn.relu(
                nn.Dense(self.hid, name=f"phr{i}")(
                    jnp.concatenate([phrases, phr_in], -1)
                )
            )
            # posts aggregate from their phrases and their source
            post_from_phr = typed_sum(phrases, pp_r, pp_s, n_h, n_p)
            post_from_src = typed_sum(sources, sp_s, sp_r, n_s, n_p)
            posts = nn.relu(
                nn.Dense(self.hid, name=f"post{i}")(
                    jnp.concatenate([posts, post_from_phr, post_from_src], -1)
                )
            )

        return {
            "posts": nn.Dense(self.out_dim, name="out")(posts),
            "phrases": phrases,
            "sources": sources,
        }
