"""Custom Python DataSource WRITER — the display board as a real sink.

The reference's only output is drawing the latest reading onto the Presto
display each tick (/root/reference/weather.py:214-273, the render path).
Here that presentation sink becomes a proper Spark V2 sink connector: a
``format("weather_board")`` batch writer emitting JSON-lines display
frames, with the standard two-phase task-commit protocol:

- each task writes its partition to a uniquely named temp file and
  returns a commit message (file + row count);
- the driver-side ``commit`` renames every temp file into place only
  after ALL tasks succeeded, and ``abort`` deletes the temps — so
  readers never observe a torn write, the same all-or-nothing contract
  the parquet committer provides (and the s24 streaming sink's
  metadata-log cousin).

Scale: tasks write independently (no coordination until commit); the
commit is O(files) renames on the driver — the classic V2 sink shape.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class BoardCommitMessage(WriterCommitMessage):
    tmp_file: str
    n_rows: int


class BoardWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator) -> BoardCommitMessage:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), sort_keys=True) + "\n")
                n += 1
        return BoardCommitMessage(tmp_file=tmp, n_rows=n)

    def commit(self, messages) -> None:
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            os.replace(m.tmp_file, final)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_file):
                os.remove(m.tmp_file)


class WeatherBoardDataSource(DataSource):
    """format("weather_board") — JSON-lines display-frame sink."""

    @classmethod
    def name(cls) -> str:
        return "weather_board"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return BoardWriter(dict(self.options))


def register_board_sink(spark) -> None:
    spark.dataSource.register(WeatherBoardDataSource)
