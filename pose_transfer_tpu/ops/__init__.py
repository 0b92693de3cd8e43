from . import masks, nn_loss, norm, ssim, warp  # noqa: F401
