"""FLAC codec family — TPU-first lossless decode.

Host structural walk (``frontend``) + fused device decode
(``device``): lane-parallel rice scan, exact integer LPC/FIXED
predictor reconstruction, stereo decorrelation and PCM assembly.
A beyond-reference family (the reference project decodes WAV/AIFF and
frames MPEG only).
"""

from . import frontend  # noqa: F401
# decoder (and with it device/jax) imports lazily via models.MODELS
