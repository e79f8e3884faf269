from mafyolo_tpu.parallel.mesh import (data_sharding, init_distributed,  # noqa: F401
                                       make_mesh, replicated)
