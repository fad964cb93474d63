"""Pallas TPU kernels for the hot ops."""

from .window_attention import fused_window_channel_attention

__all__ = ["fused_window_channel_attention"]
