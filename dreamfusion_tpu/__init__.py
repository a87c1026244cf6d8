"""dreamfusion_tpu: TPU-native text/image-to-3D (DreamFusion-style SDS).

Brand-new JAX/XLA/Pallas implementation with the capabilities of
ashawkey/stable-dreamfusion (see SURVEY.md for the blueprint).
"""

import os


def _enable_compile_cache():
    """Persistent XLA compilation cache: recompiling the fused SDS step in
    every process costs minutes; the cache makes resume/test/bench restarts
    near-instant."""
    try:
        import jax
        cache_dir = os.environ.get("DFTPU_COMPILE_CACHE",
                                   os.path.expanduser("~/.cache/dftpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (keeps `import dreamfusion_tpu` light)."""
    if name == "Config":
        from .config import Config
        return Config
    if name == "Trainer":
        from .training.trainer import Trainer
        return Trainer
    if name == "DMTetTrainer":
        from .training.dmtet_trainer import DMTetTrainer
        return DMTetTrainer
    if name == "NeRFRenderer":
        from .models.renderer import NeRFRenderer
        return NeRFRenderer
    raise AttributeError(name)
