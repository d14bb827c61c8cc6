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
    senders: jnp.ndarray, receivers: jnp.ndarray, max_edges: int, num_nodes: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pad edge lists to a static size; padded edges point at a ghost node."""
    e = senders.shape[0]
    if e > max_edges:
        raise ValueError(f"edge count {e} exceeds max_edges {max_edges}")
    pad = max_edges - e
    mask = jnp.concatenate([jnp.ones(e, bool), jnp.zeros(pad, bool)])
    s = jnp.concatenate([senders, jnp.full((pad,), num_nodes, senders.dtype)])
    r = jnp.concatenate([receivers, jnp.full((pad,), num_nodes, receivers.dtype)])
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

        for i in range(self.rounds):
            # phrases aggregate from posts that use them
            phr_in = jax.ops.segment_sum(
                posts[jnp.clip(pp_s, 0, posts.shape[0] - 1)],
                pp_r,
                num_segments=phrases.shape[0],
            )
            phrases = nn.relu(
                nn.Dense(self.hid, name=f"phr{i}")(
                    jnp.concatenate([phrases, phr_in], -1)
                )
            )
            # posts aggregate from their phrases and their source
            post_from_phr = jax.ops.segment_sum(
                phrases[jnp.clip(pp_r, 0, phrases.shape[0] - 1)],
                pp_s,
                num_segments=posts.shape[0],
            )
            post_from_src = jax.ops.segment_sum(
                sources[jnp.clip(sp_s, 0, sources.shape[0] - 1)],
                sp_r,
                num_segments=posts.shape[0],
            )
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
