from recsys_tpu.io.glibc_random import GlibcRandom, rand01_sequence
from recsys_tpu.io.parser import load_problem, parse_in_bytes
from recsys_tpu.io.writers import format_recommendations

__all__ = [
    "GlibcRandom",
    "rand01_sequence",
    "load_problem",
    "parse_in_bytes",
    "format_recommendations",
]
