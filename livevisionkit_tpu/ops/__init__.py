# Low-level image ops (XLA-composed reference impls + Pallas fast paths).
# Submodules are imported lazily by users to keep import cost down:
#   from livevisionkit_tpu.ops import color, resample, remap
