from .cheaptrick import cheaptrick, default_fft_size

__all__ = ["cheaptrick", "default_fft_size"]
