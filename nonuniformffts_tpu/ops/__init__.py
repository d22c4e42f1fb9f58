from . import windows, spreading, interpolation, deconvolve, fft

__all__ = ["windows", "spreading", "interpolation", "deconvolve", "fft"]
