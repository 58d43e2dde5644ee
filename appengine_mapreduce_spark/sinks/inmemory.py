"""Driver-side sinks.

- InMemoryOutput ≙ java outputs/InMemoryOutput.java:21 (collect to list)
- NoOutput       ≙ java outputs/NoOutput.java:22 (reject writes; runs the
                   action for side effects/counters only)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class InMemoryOutput:
    """Collect results to the driver. Only for small finals (the reference
    had the same caveat); ``limit`` guards accidental full-corpus collects."""

    limit: int | None = 1_000_000

    def write(self, df: DataFrame, job_name: str = "") -> list[tuple]:
        if self.limit is not None:
            df = df.limit(self.limit)
        return [tuple(r) for r in df.collect()]


@dataclass
class NoOutput:
    """Run the job for its side effects (counters, mutations); the result
    value is the output row count."""

    def write(self, df: DataFrame, job_name: str = "") -> int:
        return df.count()
