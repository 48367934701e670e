from muscle_tpu.ops.pallas.banded_walk import banded_random_walk, walk_band
