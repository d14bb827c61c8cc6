from ultrafnd_git_tpu.kernels.flash_attention import (
    flash_attention,
    reference_attention,
)

__all__ = ["flash_attention", "reference_attention"]
