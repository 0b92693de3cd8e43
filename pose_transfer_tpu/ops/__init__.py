from . import masks, nn_loss, norm, ssim, warp, warp_pallas  # noqa: F401
