"""minigpt4_tpu — a TPU-native (JAX/XLA/Pallas) multimodal inference framework
with the capabilities of minigpt4.cpp.

Pipeline: image -> EVA-CLIP ViT-G -> BLIP-2 Q-Former -> linear projection ->
Vicuna/LLaMA decoder, loading the reference's ggml container + llama.cpp
checkpoint files unmodified.
"""

__version__ = "0.1.0"


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: first 13B compiles run minutes on
    remote-compile backends; cached reloads are seconds.  Opt out with
    MINIGPT4_TPU_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("MINIGPT4_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        # separate cache per platform set: AOT artifacts compiled for a
        # remote TPU toolchain must not be offered to the local CPU backend
        suffix = os.environ.get("JAX_PLATFORMS", "default").replace(",", "_") or "default"
        cache_dir = os.environ.get(
            "MINIGPT4_TPU_COMPILE_CACHE",
            os.path.expanduser(f"~/.cache/minigpt4_tpu_xla_{suffix}"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _force_platform() -> None:
    """MINIGPT4_TPU_PLATFORM=cpu|tpu|axon pins the JAX backend via
    jax.config (which wins even where a sitecustomize pre-selects a
    platform and ignores JAX_PLATFORMS — the dev-tunnel case that
    motivated quality.py's --platform flag).  Used by CI dry-runs
    (tools/day_one_validation.sh) to keep fixture-sized work off a busy
    chip; unset = whatever the environment provides."""
    import os

    p = os.environ.get("MINIGPT4_TPU_PLATFORM")
    if not p:
        return
    try:
        import jax

        jax.config.update("jax_platforms", "axon" if p == "tpu" else p)
    except Exception:
        pass


_enable_compilation_cache()
_force_platform()
