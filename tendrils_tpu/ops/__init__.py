"""Device-side ops: the TPU equivalents of the reference's GLSL corpus."""
