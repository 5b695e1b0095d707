"""Geometry kernels, CRS transforms and the ST_* pandas-UDF registry."""
