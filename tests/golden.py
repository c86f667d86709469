"""Golden test vectors (re-exported from the package, where the CLI's
``golden`` fixture-writer command also uses them)."""

from dbde_tpu.golden_vectors import (  # noqa: F401
    GOLDEN_8x16_FILE,
    GOLDEN_8x16_IMAGE,
    README_10x10_DEPTHS,
    README_10x10_IMAGE,
    README_10x10_MINS,
    README_10x10_U64S,
)
