from mafyolo_tpu.assigners.tal import tal_assign  # noqa: F401
from mafyolo_tpu.assigners.atss import atss_assign  # noqa: F401
