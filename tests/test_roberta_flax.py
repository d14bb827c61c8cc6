"""Parity: Flax RoBERTa classifier with transferred HF torch weights.

Hermetic — builds a small randomly-initialized
`transformers.RobertaForSequenceClassification` (no downloads) and
asserts the transferred-weights Flax twin (models/roberta_flax.py)
reproduces the torch logits/probs at fp32 tolerance, including the
RoBERTa position-id quirk (cumulative non-pad counts offset by pad_id)
and the dense+tanh classification head. This is the device rung of the
affective emotion probe (reference `src/models/affective_forensics.py:
84-105`), giving it the same on-device story as BERT/CLIP/W2V2.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from ultrafnd_git_tpu.models.roberta_flax import (
    DeviceEmotionClassifier,
    RobertaClassifierFlax,
    torch_roberta_clf_to_flax_params,
)

VOCAB = 101
PAD = 1


def _tiny_roberta(seed: int = 0, num_labels: int = 7):
    from transformers import RobertaConfig, RobertaForSequenceClassification

    cfg = RobertaConfig(
        vocab_size=VOCAB,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=50,
        type_vocab_size=1,
        pad_token_id=PAD,
        num_labels=num_labels,
        hidden_act="gelu",
        id2label={
            0: "anger", 1: "disgust", 2: "fear", 3: "joy",
            4: "neutral", 5: "sadness", 6: "surprise",
        },
    )
    torch.manual_seed(seed)
    model = RobertaForSequenceClassification(cfg)
    model.eval()
    return model, cfg


def _batch(rng, B=3, L=19):
    ids = rng.integers(4, VOCAB, (B, L))
    lens = [L, 11, 5]
    for i, n in enumerate(lens):
        ids[i, n:] = PAD
    mask = (ids != PAD).astype(np.float32)
    return ids, mask


def test_transferred_weights_match_torch_logits():
    model, cfg = _tiny_roberta()
    ids, mask = _batch(np.random.default_rng(0))

    with torch.inference_mode():
        ref = model(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask, dtype=torch.long),
        ).logits.numpy()

    module = RobertaClassifierFlax(
        width=64,
        depth=2,
        heads=4,
        intermediate=128,
        vocab_size=VOCAB,
        max_positions=50,
        num_labels=7,
        pad_id=PAD,
        attention_backend="xla",
    )
    params = torch_roberta_clf_to_flax_params(model.state_dict(), depth=2)
    got = np.asarray(
        module.apply(
            {"params": params},
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(mask, jnp.float32),
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


class _IdsTokenizer:
    """Deterministic toy tokenizer with the HF call contract."""

    def __call__(self, texts, padding=True, truncation=True,
                 max_length=32, return_tensors="np"):
        seqs = []
        for t in texts:
            toks = [0] + [
                4 + (hash(w) % (VOCAB - 4)) for w in (t or "").split()
            ][: max_length - 2] + [2]
            seqs.append(toks)
        L = max(len(s) for s in seqs)
        ids = np.full((len(seqs), L), PAD, np.int64)
        mask = np.zeros((len(seqs), L), np.int64)
        for i, s in enumerate(seqs):
            ids[i, : len(s)] = s
            mask[i, : len(s)] = 1
        if return_tensors == "pt":
            return {
                "input_ids": torch.tensor(ids),
                "attention_mask": torch.tensor(mask),
            }
        return {"input_ids": ids, "attention_mask": mask}


def test_device_classifier_matches_torch_probs():
    model, cfg = _tiny_roberta()
    tok = _IdsTokenizer()
    clf = DeviceEmotionClassifier(model, tok, max_length=32)
    assert clf.label_names[2] == "fear"

    texts = ["scary alien warning", "joyful science discovery", "", "x"]
    got = clf.predict_probs(texts)
    assert got.shape == (4, 7)

    inp = tok(texts, return_tensors="pt")
    with torch.inference_mode():
        ref = torch.softmax(model(**inp).logits, dim=-1).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_affective_routes_through_device_twin(monkeypatch):
    """AffectiveForensics.text_probs_batch must use the device twin when
    the HF rung is live, and its bucketed output must match the host
    torch path bit-for-near (same label buckets, same normalization)."""
    from ultrafnd_git_tpu.models.affective import AffectiveForensics
    from ultrafnd_git_tpu.utils import hf as hf_mod

    model, _ = _tiny_roberta()
    tok = _IdsTokenizer()
    hf_mod.reset_memo()
    monkeypatch.delenv("ULTRAFND_DISABLE_HF", raising=False)

    af = AffectiveForensics(text_model="tiny-test-roberta")
    monkeypatch.setattr(
        af, "_hf_pipe", lambda: (torch, tok, model)
    )
    texts = ["scary alien warning", "joyful discovery", ""]
    out = af.text_probs_batch(texts)
    assert out.shape == (3, 3)
    # the memoized device twin was actually built and engaged
    twin = hf_mod._MEMO.get("affective-device:tiny-test-roberta")
    assert twin is not None

    # equals the torch rung's bucketing of the same probabilities
    inp = tok(texts, return_tensors="pt")
    with torch.inference_mode():
        p = torch.softmax(model(**inp).logits, dim=-1).numpy()
    ref = AffectiveForensics._bucket_probs(p, twin.label_names)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
    hf_mod.reset_memo()


def test_non_roberta_checkpoint_rejected():
    from transformers import BertConfig, BertModel

    cfg = BertConfig(
        vocab_size=VOCAB, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=128,
    )
    model = BertModel(cfg)
    with pytest.raises(ValueError, match="RoBERTa"):
        DeviceEmotionClassifier(model, _IdsTokenizer())
