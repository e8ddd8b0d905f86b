"""Pure numpy/python kernels (no Spark imports) used inside pandas UDFs."""
