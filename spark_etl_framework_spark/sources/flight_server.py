"""Minimal in-process Arrow Flight server: the dev/test endpoint for the
Flight connector (sources/flight.py).

NOT a production server — it holds datasets in memory and exists so the
connector's full client contract (GetFlightInfo schema + endpoint
resolution, per-endpoint DoGet, per-task DoPut) can be exercised
end-to-end against a real gRPC wire without any external service. The
endpoint-splitting knob matters: ``serve(name, table, endpoints=N)``
shards the dataset into N tickets, which the Spark side MUST turn into N
scan partitions — that mapping is the whole scale story of the
connector, and the tests pin it.
"""

from __future__ import annotations

import threading


class InMemoryFlightServer:
    """Serve named pyarrow Tables over grpc://127.0.0.1:<free port>."""

    def __init__(self):
        import pyarrow.flight as fl

        outer = self

        class _Server(fl.FlightServerBase):
            def __init__(self):
                super().__init__(location="grpc://127.0.0.1:0")

            def get_flight_info(self, context, descriptor):
                name = descriptor.path[0].decode()
                table, n_end = outer._get(name)
                rows = table.num_rows
                endpoints = []
                # contiguous row ranges, one ticket per endpoint; no
                # explicit location -> client falls back to the origin
                step = max(1, -(-rows // n_end))
                for i in range(n_end):
                    lo = i * step
                    if lo >= rows and i > 0:
                        break
                    endpoints.append(
                        fl.FlightEndpoint(f"{name}:{lo}:{step}".encode(), [])
                    )
                return fl.FlightInfo(
                    table.schema, descriptor, endpoints, table.num_rows, -1
                )

            def do_get(self, context, ticket):
                name, lo, step = ticket.ticket.decode().rsplit(":", 2)
                table, _ = outer._get(name)
                return fl.RecordBatchStream(table.slice(int(lo), int(step)))

            def do_put(self, context, descriptor, reader, writer):
                import pyarrow as pa

                name = descriptor.path[0].decode()
                incoming = reader.read_all()
                with outer._lock:
                    prev = outer._tables.get(name)
                    merged = (
                        incoming
                        if prev is None
                        else pa.concat_tables([prev[0], incoming])
                    )
                    outer._tables[name] = (merged, prev[1] if prev else 1)

        self._tables: dict[str, tuple] = {}
        self._lock = threading.Lock()
        self._server = _Server()
        self._thread = threading.Thread(target=self._server.serve, daemon=True)
        self._thread.start()

    def _get(self, name: str):
        with self._lock:
            if name not in self._tables:
                raise KeyError(f"flight server: unknown dataset {name!r}")
            return self._tables[name]

    @property
    def port(self) -> int:
        return self._server.port

    def serve(self, name: str, table, endpoints: int = 1) -> None:
        with self._lock:
            self._tables[name] = (table, max(1, endpoints))

    def table(self, name: str):
        return self._get(name)[0]

    def shutdown(self) -> None:
        self._server.shutdown()
