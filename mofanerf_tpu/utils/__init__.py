from mofanerf_tpu.utils.metrics import img2mse, mse2psnr, to8b

__all__ = ["img2mse", "mse2psnr", "to8b"]
