"""ocrspark — a PySpark-native document-extraction engine.

A from-scratch rebuild of the *computed semantics* of
``magnusendresen/OCRacle`` (exam-PDF -> structured task catalog), re-expressed
as a three-stage Spark DataFrame pipeline over interleaved text+media span
tables:

  stage 1  vectorized Arrow recovery   (``ocrspark.stage1``)
  stage 2  rule-based segmentation     (``ocrspark.segment``, ``ocrspark.rules``)
  stage 3  ordered span reassembly     (``ocrspark.assemble``)

plus batch checkpoint/resume (``ocrspark.checkpoint``), skew-aware
partitioning (``ocrspark.partitioning``) and a training-data operator suite
(``ocrspark.ops``).  Every LLM call site in the reference is replaced by a
deterministic rule (see ``ocrspark.config`` for the census).

No code is ported from the reference; citations in docstrings are
``file:line`` into ``/root/reference`` and document *behavioural* parity only.
"""

__version__ = "0.1.0"
