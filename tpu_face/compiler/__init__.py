from .lowering import (Graph, build_jax_fn, flatten_batching,
                       graph_flops, load_model_fn)

__all__ = ["Graph", "build_jax_fn", "flatten_batching", "graph_flops",
           "load_model_fn"]
