"""Text chunking (SURVEY §2.2 T1/T2).

The reference splits documents with langchain's
RecursiveCharacterTextSplitter — chunkSize 1000 at
controllers/customTrainDataController.js:61, 1500 at
utils/textutils.js:20-24, both with the library defaults
(chunkOverlap 200, separators ["\\n\\n", "\\n", " ", ""]).

Two implementations:

* :func:`recursive_split` — a from-scratch reimplementation of the
  public recursive-character-splitting semantics, applied per-document
  through an Arrow-batched pandas UDF (one Python call per batch, not
  per row). Inherently imperative per-string logic — the one legitimate
  UDF in the text pipeline.
* :func:`chunk_fixed` — fixed-window chunking as a pure column
  expression (sequence + substring + posexplode): fully declarative,
  codegen-friendly, SQL-oracle-checkable, and the right shape for
  100 TB (no Python in the path).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

DEFAULT_SEPARATORS = ["\n\n", "\n", " ", ""]


def recursive_split_text(
    text: str,
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
    separators: list[str] | None = None,
) -> list[str]:
    """Recursive character splitting, reimplemented from the public
    algorithm: try coarse separators first, recurse into finer ones for
    oversized pieces, then greedily merge adjacent pieces up to
    ``chunk_size`` keeping a ``chunk_overlap`` tail between chunks.
    """
    seps = DEFAULT_SEPARATORS if separators is None else separators

    def merge(pieces: list[str], sep: str) -> list[str]:
        sep_len = len(sep)
        chunks: list[str] = []
        window: list[str] = []
        total = 0
        for piece in pieces:
            plen = len(piece)
            if window and total + plen + sep_len > chunk_size:
                joined = sep.join(window).strip()
                if joined:
                    chunks.append(joined)
                # Shrink the window to the overlap budget (also make
                # room for the incoming piece).
                while window and (
                    total > chunk_overlap
                    or (total + plen + sep_len > chunk_size and total > 0)
                ):
                    total -= len(window[0]) + (sep_len if len(window) > 1 else 0)
                    window = window[1:]
            window.append(piece)
            total += plen + (sep_len if len(window) > 1 else 0)
        joined = sep.join(window).strip()
        if joined:
            chunks.append(joined)
        return chunks

    def split(text: str, seps: list[str]) -> list[str]:
        sep = seps[-1]
        rest: list[str] = []
        for i, s in enumerate(seps):
            if s == "" or s in text:
                sep = s
                rest = seps[i + 1 :]
                break
        pieces = list(text) if sep == "" else text.split(sep)
        out: list[str] = []
        small: list[str] = []
        for piece in pieces:
            if len(piece) < chunk_size:
                small.append(piece)
            else:
                if small:
                    out.extend(merge(small, sep))
                    small = []
                out.extend(split(piece, rest) if rest else [piece])
        if small:
            out.extend(merge(small, sep))
        return out

    return split(text, seps)


def recursive_split(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 1000,
    chunk_overlap: int = 200,
) -> DataFrame:
    """doc table -> chunk table (doc_id, chunk_id, text, n_chars) via the
    recursive splitter (T1: chunk table shape per FIXTURES.md)."""

    @F.pandas_udf(ArrayType(StringType()))
    def split_udf(texts: pd.Series) -> pd.Series:
        # Empty/NULL text -> one empty chunk, never zero: posexplode of
        # an empty array would DROP the document, while the declarative
        # twin (chunk_fixed, greatest(...,1)) always emits a row — the
        # two variants must agree on row count per doc or swapping them
        # (the stated scale migration) changes downstream joins.
        return texts.map(
            lambda t: recursive_split_text(
                t or "", chunk_size, chunk_overlap
            )
            or [""]
        )

    return (
        df.select(
            id_col, F.posexplode(split_udf(F.col(text_col)))
        )
        .select(
            id_col,
            F.col("pos").cast("int").alias("chunk_id"),
            F.col("col").alias("text"),
            F.length("col").cast("int").alias("n_chars"),
        )
    )


def chunk_fixed_expr(text: Column, size: int) -> Column:
    """Array of fixed-size windows over a string, pure expression."""
    n = F.greatest(
        F.ceil(F.length(text) / F.lit(size)).cast("int"), F.lit(1)
    )
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.substring(text, (i - F.lit(1)) * size + 1, size),
    )


def chunk_fixed(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 1000,
) -> DataFrame:
    """Fixed-window chunk table — the declarative/scalable variant."""
    return df.select(
        id_col, F.posexplode(chunk_fixed_expr(F.col(text_col), size))
    ).select(
        id_col,
        F.col("pos").cast("int").alias("chunk_id"),
        F.col("col").alias("text"),
        F.length("col").cast("int").alias("n_chars"),
    )
