from mafyolo_tpu.solver.build import (build_lr_fn, group_of, param_groups,  # noqa: F401
                                      sgd_init, sgd_update, warmup_schedule)
