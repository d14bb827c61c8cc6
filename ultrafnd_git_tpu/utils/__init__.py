from ultrafnd_git_tpu.utils.config import ConfigManager, load_yaml

__all__ = ["ConfigManager", "load_yaml"]
