"""Device-tower rung of the text-encoder ladder."""
import numpy as np

from ultrafnd_git_tpu.models.text import BERTContextEncoder


def test_tower_rung_engages_when_enabled():
    enc = BERTContextEncoder(dim=64, max_length=16, use_device_tower=True)
    assert not enc.use_hf  # HF disabled by conftest -> tower rung active
    out = enc.encode_batch(["外星人 入侵", "", "证据 科学"])
    assert out.shape == (3, 64)
    assert np.all(out[1] == 0.0)  # empty text stays zero
    np.testing.assert_allclose(
        np.linalg.norm(out[[0, 2]], axis=-1), 1.0, atol=1e-4
    )
    # differs from the hash rung
    hash_enc = BERTContextEncoder(dim=64, max_length=16,
                                  use_device_tower=False)
    assert not np.allclose(out, hash_enc.encode_batch(
        ["外星人 入侵", "", "证据 科学"]))


def test_env_var_opt_in(monkeypatch):
    monkeypatch.setenv("ULTRAFND_TEXT_DEVICE", "1")
    enc = BERTContextEncoder(dim=64, max_length=16)
    assert enc._want_device_tower
    monkeypatch.setenv("ULTRAFND_TEXT_DEVICE", "0")
    enc2 = BERTContextEncoder(dim=64, max_length=16)
    assert not enc2._want_device_tower


def test_single_and_batch_agree():
    enc = BERTContextEncoder(dim=64, max_length=16, use_device_tower=True)
    single = enc.encode("谣言 危险")
    batch = enc.encode_batch(["谣言 危险"])[0]
    np.testing.assert_allclose(single, batch, atol=1e-6)
