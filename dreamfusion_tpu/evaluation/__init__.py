"""Offline evaluation tools (reference /root/reference/evaluation/):
CLIP R-precision scoring and turntable videos of exported meshes."""
