"""Config system, metrics (ATE/RPE), profiling, synthetic datasets."""
