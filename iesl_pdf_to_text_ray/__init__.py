"""Ray-Data-native PDF text-extraction and training-data engine."""

import logging


class _EmptySchemaDivergenceFilter(logging.Filter):
    """Drop Ray Data's schema-divergence warning for EMPTY bundles only.

    Sort/Aggregate shuffle partitions that receive no groups emit
    RefBundles with zero blocks and therefore no schema; the streaming
    executor's dedupe_schemas_with_validation treats an empty *old*
    schema as non-diverged but warns when the *new* one is empty
    (ray/data/_internal/execution/streaming_executor_state.py:784-797),
    even though map_batches UDFs are never invoked on those bundles and
    every populated block carries the pinned schema.  Real divergences
    (two non-empty, different schemas) still warn — the filter matches
    only the empty-new-schema message shape.
    """

    def filter(self, record: logging.LogRecord) -> bool:  # pragma: no cover
        msg = record.getMessage()
        return not ("RefBundle with a different schema" in msg
                    and "new schema: ." in msg)


logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptySchemaDivergenceFilter())
