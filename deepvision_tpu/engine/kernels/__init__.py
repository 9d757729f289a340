"""Pallas TPU kernels for the serving engine's hot ops."""

from deepvision_tpu.engine.kernels.flash_attention import flash_attention
from deepvision_tpu.engine.kernels.paged_attention import (
    paged_attention,
    paged_attention_reference,
)

__all__ = [
    "flash_attention",
    "paged_attention",
    "paged_attention_reference",
]
