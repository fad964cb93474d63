"""Host-side datasets and the async device-feed pipeline."""

from .dataset import (
    ImageFolderDataset, random_patch_mask, prefetch_to_device, list_images,
)
from .synthetic import render_photo, monetize, write_domains

__all__ = [
    "ImageFolderDataset", "random_patch_mask", "prefetch_to_device",
    "list_images", "render_photo", "monetize", "write_domains",
]
