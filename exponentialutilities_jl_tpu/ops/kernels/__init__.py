"""Subpackage of exponentialutilities.jl_tpu."""
