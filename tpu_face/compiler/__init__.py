from .lowering import Graph, build_jax_fn, graph_flops, load_model_fn

__all__ = ["Graph", "build_jax_fn", "graph_flops", "load_model_fn"]
