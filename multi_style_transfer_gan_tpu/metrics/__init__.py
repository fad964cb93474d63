"""Evaluation metrics (SSIM/PSNR/MSE/FID) and reporting."""

from .quality import mse, psnr, ssim, compare_pair
from .fid import frechet_distance, fid_from_features

__all__ = ["mse", "psnr", "ssim", "compare_pair",
           "frechet_distance", "fid_from_features"]
