from mafyolo_tpu.models.graph import parse_graph, GraphNet, MAFYolo, build_model  # noqa: F401
