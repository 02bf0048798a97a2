from .msm import default_window, msm, msm_jit, signed_digits, window_sums

__all__ = ["default_window", "msm", "msm_jit", "signed_digits", "window_sums"]
