from .textsink import write_sorted_kv_text

__all__ = ["write_sorted_kv_text"]
