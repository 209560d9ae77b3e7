"""Subpackage of kornia_tpu."""
