"""mebt_tpu — a TPU-native framework for memory-efficient bidirectional
video transformers (MeBT, CVPR 2023), built from scratch on JAX/XLA/Pallas.

Capability parity target: Ugness/MeBT (see SURVEY.md). Compute path is
jax/jit/pallas over `jax.sharding.Mesh`; runtime helpers (data loading,
checkpoint import, eval statistics) run on host.

Top-level API (lazily imported so `import mebt_tpu` stays light):

    MeBT, MeBTConfig            stage-2 transformer (models.mebt)
    VQGAN, VQGANConfig          stage-1 tokenizer (models.vqgan)
    MaskGen                     mask schedules (sampler.mask_schedule)
    maskgit_sample, draft_and_revise        decode engines
    bidirect_generate, extrapolate_generate, dnr_generate
                                generation drivers (sampler.generation)
    MeBTTrainer                 training loop (train.trainer)
    load_configs                layered YAML config (config)
    load_mebt, load_vqgan       published-torch-checkpoint import
"""

__version__ = "0.2.0"

_EXPORTS = {
    "MeBT": "mebt_tpu.models.mebt",
    "MeBTConfig": "mebt_tpu.models.mebt",
    "mlm_loss": "mebt_tpu.models.mebt",
    "VQGAN": "mebt_tpu.models.vqgan",
    "VQGANConfig": "mebt_tpu.models.vqgan",
    "MaskGen": "mebt_tpu.sampler.mask_schedule",
    "maskgit_plan": "mebt_tpu.sampler.mask_schedule",
    "bootstrap_plan": "mebt_tpu.sampler.mask_schedule",
    "maskgit_sample": "mebt_tpu.sampler.decode",
    "entp_sample": "mebt_tpu.sampler.decode",
    "draft_and_revise": "mebt_tpu.sampler.decode",
    "bidirect_generate": "mebt_tpu.sampler.generation",
    "extrapolate_generate": "mebt_tpu.sampler.generation",
    "dnr_generate": "mebt_tpu.sampler.generation",
    "MeBTTrainer": "mebt_tpu.train.trainer",
    "load_configs": "mebt_tpu.config",
    "instantiate_from_config": "mebt_tpu.config",
    "load_mebt": "mebt_tpu.utils.torch_ckpt",
    "load_vqgan": "mebt_tpu.utils.torch_ckpt",
}

__all__ = sorted(_EXPORTS) + ["__version__"]


def __getattr__(name):
    if name in _EXPORTS:
        import importlib

        module = importlib.import_module(_EXPORTS[name])
        value = getattr(module, name)
        globals()[name] = value  # cache for subsequent lookups
        return value
    raise AttributeError(f"module 'mebt_tpu' has no attribute {name!r}")


def __dir__():
    return __all__
