from .lowering import Graph, build_jax_fn, load_model_fn

__all__ = ["Graph", "build_jax_fn", "load_model_fn"]
