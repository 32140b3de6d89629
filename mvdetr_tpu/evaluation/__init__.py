from mvdetr_tpu.evaluation.clear import clear_metrics, evaluate_files

__all__ = ["clear_metrics", "evaluate_files"]
