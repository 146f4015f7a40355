from .inference import column_profile, infer_repetition

__all__ = ["column_profile", "infer_repetition"]
