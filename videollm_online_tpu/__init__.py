"""videollm-online-tpu: TPU-native streaming video LLM framework.

Public API (lazy imports keep `import videollm_online_tpu` light):

  config    — core.config: LiveConfig, live1_config, live1_plus_config
  models    — llama / siglip / live / generate / quant / convert / builder
  serving   — serve.engine.LiveInferEngine, serve.multistream.MultiStreamEngine
  training  — train.trainer.LiveTrainer, train_entry.train, evaluate_entry
  data      — data.registry builders, data.collator
"""

__version__ = "0.1.0"

_LAZY = {
    "LiveConfig": ("videollm_online_tpu.core.config", "LiveConfig"),
    "live1_config": ("videollm_online_tpu.core.config", "live1_config"),
    "live1_plus_config": ("videollm_online_tpu.core.config",
                          "live1_plus_config"),
    "LiveInferEngine": ("videollm_online_tpu.serve.engine", "LiveInferEngine"),
    "MultiStreamEngine": ("videollm_online_tpu.serve.multistream",
                          "MultiStreamEngine"),
    "LiveTrainer": ("videollm_online_tpu.train.trainer", "LiveTrainer"),
    "LiveTokenizer": ("videollm_online_tpu.tokenizer.live_tokenizer",
                      "LiveTokenizer"),
    "build_live_tokenizer": ("videollm_online_tpu.tokenizer.live_tokenizer",
                             "build_live_tokenizer"),
    "build_model_and_tokenizer": ("videollm_online_tpu.models.builder",
                                  "build_model_and_tokenizer"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)


__all__ = list(_LAZY)
