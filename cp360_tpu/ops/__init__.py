# Submodules are imported explicitly (cp360_tpu.ops.cube_pad, .resample,
# .pallas_kernels); no re-exports here — the natural API names (cube_pad)
# collide with submodule names and would shadow them.
