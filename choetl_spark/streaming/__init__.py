"""Streaming scope note.

The reference has NO streaming operators — no watermarks, event-time
windows, or stateful processing anywhere (verified: SURVEY.md §2.10; its
`SkipUntil`/`DoWhile` reader events, reference src/ChoETL/IChoReader.cs:22-23,
are pull-side gating). The north rule is a batch encode with
resume-from-checkpoint, which lives in ``choetl_spark.ledger``.

What we expose here is the honest Spark analog of ChoETL's only
"incremental" behavior (file Append mode): incremental batch encode of
newly-arrived rows, which is exactly ``ledger.encode_with_resume`` — new
partitions encode, completed ones skip. For a true continuous source this
would become Structured Streaming ``foreachBatch`` calling the same
function; the engine kernel is already batch-shaped for it.
"""

from choetl_spark.ledger import encode_with_resume as incremental_encode  # noqa: F401
