import pathlib

from ultrafnd_git_tpu.utils import ConfigManager, load_yaml

CONFIG_DIR = pathlib.Path(__file__).resolve().parents[1] / "configs" / "model_configs"


def test_loads_all_nine_configs():
    names = [
        "fusion", "classifier", "text_blocks", "audio_blocks",
        "visual_blocks", "temporal_blocks", "affective", "chronos_guard",
        "semantic",
    ]
    cm = ConfigManager()
    for n in names:
        cfg = cm.load_config(f"configs/model_configs/{n}.yaml")
        assert isinstance(cfg, dict) and cfg, n


def test_root_relative_resolution():
    cfg = ConfigManager().load_config("configs/model_configs/fusion.yaml")
    assert cfg["hidden_dim"] == 512
    assert cfg["use_gnn"] is True
    assert cfg["gnn_dim"] == 128


def test_missing_returns_defaults():
    cfg = ConfigManager().load_config("no/such/file.yaml", defaults={"a": 1})
    assert cfg == {"a": 1}
    assert ConfigManager().load_config("no/such/file.yaml") == {}


def test_defaults_merge_under_file_values():
    cfg = load_yaml(
        "configs/model_configs/classifier.yaml",
        defaults={"node_trees": 99, "extra_key": "kept"},
    )
    assert cfg["node_trees"] == 6  # file value wins
    assert cfg["extra_key"] == "kept"


def test_caching(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("x: 1\n")
    cm = ConfigManager()
    assert cm.load_config(str(p))["x"] == 1
    p.write_text("x: 2\n")
    assert cm.load_config(str(p))["x"] == 1  # cached by abs path


def test_caller_mutation_does_not_poison_cache(tmp_path):
    """The shared cache hands out copies: a caller mutating its returned
    config must not change what later loads of the same YAML see."""
    p = tmp_path / "m.yaml"
    p.write_text("x: 1\n")
    cfg = ConfigManager().load_config(str(p))
    cfg["x"] = 999
    cfg["injected"] = True
    clean = ConfigManager().load_config(str(p))
    assert clean == {"x": 1}
