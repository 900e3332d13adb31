from cmgan_tpu.ops.flash_attention import (
    flash_rel_attention,
    make_rel_band,
    reference_attention,
)

__all__ = ["flash_rel_attention", "make_rel_band", "reference_attention"]
