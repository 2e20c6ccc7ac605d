from .grid_sample import grid_sample, grid_sample_nchw
from .interpolate import resize_bilinear, adaptive_avg_pool
