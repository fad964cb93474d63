"""Host-side datasets and the async device-feed pipeline."""

from .dataset import (
    ImageFolderDataset, random_patch_mask, prefetch_to_device, list_images,
)

__all__ = [
    "ImageFolderDataset", "random_patch_mask", "prefetch_to_device",
    "list_images",
]
