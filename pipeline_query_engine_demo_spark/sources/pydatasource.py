"""Spark 4 Python Data Source API coverage: a custom partitioned batch
source (`spark.dataSource.register` + `spark.read.format(...)`).

The reference's only source is an in-memory chunk generator
(``src/executor/mod.rs:250-276``); this is the Spark-native way to wrap
such a generator as a first-class source: the engine asks the Python
class for partitions, then calls ``read`` once per partition IN
PARALLEL on the executors — so a custom feed (an internal service, a
bespoke file format, a synthetic generator) scales out like any
built-in source instead of funneling through the driver.

The demo source emits a deterministic integer sequence with derived
columns, sliced into N_PARTITIONS independent ranges — each partition
computes its own slice from (start, end) alone, the property that makes
the source embarrassingly parallel at any size.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Rows and parallelism of the demo feed. Small because every row flows
#: through Python; the API contract (partition-parallel reads) is what
#: is under test, not throughput.
N_ROWS = 1000
N_PARTITIONS = 8


class _SliceParts(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class SequenceFeedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", N_ROWS))

    def partitions(self) -> list[InputPartition]:
        step = -(-self.n_rows // N_PARTITIONS)
        return [
            _SliceParts(i, min(i + step, self.n_rows))
            for i in range(0, self.n_rows, step)
        ]

    def read(self, partition: _SliceParts):
        for n in range(partition.start, partition.end):
            yield (n, n * n, "even" if n % 2 == 0 else "odd")


class SequenceFeedSource(DataSource):
    """``format("sequence_feed")``: deterministic demo feed."""

    @classmethod
    def name(cls) -> str:
        return "sequence_feed"

    def schema(self) -> str:
        return "n BIGINT, n_squared BIGINT, parity STRING"

    def reader(self, schema) -> SequenceFeedReader:  # noqa: ANN001
        return SequenceFeedReader(self.options)


#: Streaming half of the API: a resumable offset-based feed. Offsets are
#: a plain dict checkpointed by Spark; `read` prefetches the next slice
#: and advances the offset, `readBetweenOffsets` replays a committed
#: range deterministically on recovery — the exactly-once contract.
STREAM_TOTAL = 100
STREAM_BATCH = 40


class CounterStreamReader(SimpleDataSourceStreamReader):
    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        pos = start["pos"]
        end = min(pos + STREAM_BATCH, STREAM_TOTAL)
        return iter([(i, i % 5) for i in range(pos, end)]), {"pos": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([(i, i % 5) for i in range(start["pos"], end["pos"])])


class CounterStreamSource(DataSource):
    """``readStream.format("counter_feed")``: bounded demo stream."""

    @classmethod
    def name(cls) -> str:
        return "counter_feed"

    def schema(self) -> str:
        return "n BIGINT, grp BIGINT"

    def simpleStreamReader(self, schema) -> CounterStreamReader:  # noqa: ANN001
        return CounterStreamReader()
