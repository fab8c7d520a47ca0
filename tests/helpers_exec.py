"""Importable user UDF for the --content-exec CLI tests.

Lives in a standalone module (not inside a test file) because the CLI
resolves the spec with importlib and map_batches workers must be able to
import it by name.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def reversed_text(batch: pa.Table) -> pa.Array:
    """Content = the text column reversed per row (an obviously-custom
    projection no built-in loader provides)."""
    return pc.utf8_reverse(batch["text"])
