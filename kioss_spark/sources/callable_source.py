"""Python DataSource backing re-invocable callable sources.

The reference's ``Stream(callable)`` re-invokes the callable at each
iteration start (streamable/visitors/iterator.py:146-159).  A
``createDataFrame`` snapshot breaks that for callables returning fresh data
per call; this DataSource's ``read`` runs inside every Spark job, so each
action re-invokes the callable.

The callable travels as a cloudpickle payload in a string option (the
DataSource API only passes string options).  Single partition by design:
a driver-callable source is unpartitioned Python data — the scale path is
file scans.
"""

from __future__ import annotations

import base64
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader


class CallableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kioss_callable"

    def schema(self):  # pragma: no cover - schema always passed explicitly
        raise NotImplementedError("kioss_callable requires an explicit schema")

    def reader(self, schema) -> "CallableReader":
        return CallableReader(self.options, schema)


class CallableReader(DataSourceReader):
    def __init__(self, options, schema) -> None:
        self._payload = options["fn"]
        self._n_fields = int(options.get("n_fields", "1"))
        self._scalar = options.get("scalar", "infer")
        self._fields = [f.name for f in schema.fields]

    def read(self, partition) -> Iterator[tuple]:
        from pyspark import cloudpickle

        fn = cloudpickle.loads(base64.b64decode(self._payload))
        scalar = self._scalar
        for x in fn():
            if scalar == "1":
                yield (x,)
            elif scalar == "0":
                yield self._as_row(x)
            else:  # infer per element (explicit-schema path); mirrors
                # from_iterable: a list under a single-field schema IS the
                # column value (ArrayType), not a multi-field row
                if self._n_fields == 1 and not isinstance(x, (dict, tuple)):
                    yield (x,)
                elif isinstance(x, (dict, tuple, list)):
                    yield self._as_row(x)
                else:
                    yield (x,)

    def _as_row(self, x) -> tuple:
        if isinstance(x, dict):
            # align by schema field name, same as createDataFrame on dicts
            return tuple(x.get(name) for name in self._fields)
        return tuple(x)
