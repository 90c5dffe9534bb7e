"""Conversation rollup documents (SURVEY.md C11).

The north star indexes both individual turns and rolled-up conversations.
A rollup document's text is the conversation's turns concatenated in
turn_idx order with single spaces (so its token stream equals the
concatenation of the turn token streams under the whitespace-ish analyzer).

Rollup doc_ids start after all turn doc_ids:
    rollup_doc_id = n_turn_docs + conv_rank
which keeps the full docID space stable and dense under (is_rollup,
conv_id, turn_idx) order, a pure function of the data.

Implementation is one hash aggregation: collect (turn_idx, text) structs
per conversation, sort the (bounded-size) array, concat — all JVM-side
built-ins, no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_docs(transcripts: DataFrame, offsets: DataFrame, n_turn_docs: int) -> DataFrame:
    """(conv_id, turn_idx=-1, text, doc_id, is_rollup=true) per conversation.

    ``offsets`` is conversation_offsets() output (conv_id, conv_rank);
    ``n_turn_docs`` the total turn-document count.
    """
    rolled = (
        transcripts.groupBy("conv_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text")
        )
    )
    return (
        rolled.join(offsets.select("conv_id", "conv_rank"), "conv_id")
        .withColumn("doc_id", (F.lit(n_turn_docs) + F.col("conv_rank")).cast("long"))
        .withColumn("turn_idx", F.lit(-1).cast("int"))
        .withColumn("is_rollup", F.lit(True))
        .select("doc_id", "conv_id", "turn_idx", "text", "is_rollup")
    )
