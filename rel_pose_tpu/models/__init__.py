from .vitess import vitess_init, vitess_forward, normalize_preds

__all__ = ["vitess_init", "vitess_forward", "normalize_preds"]
