from .msm import default_window, msm, msm_jit, pick_cap, signed_digits

__all__ = ["default_window", "msm", "msm_jit", "pick_cap", "signed_digits"]
