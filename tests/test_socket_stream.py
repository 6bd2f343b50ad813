"""Socket stream source (the reference's actual input channel,
big_data_computing_3.py:62): serve integers over a local TCP socket and
run the sampler pipeline against it."""

from __future__ import annotations

import socket
import threading
import time

import pytest
from pyspark.sql import functions as F

from big_data_computing__spark.streaming.frequent_stream import (
    SamplerState,
    collect_in_arrival_order,
    socket_items,
)


class _LineServer(threading.Thread):
    """Serves one line per item to the first client, then keeps the
    connection open (Structured Streaming reconnects on close)."""

    def __init__(self, items: list[int]):
        super().__init__(daemon=True)
        self.items = items
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.sock.listen(1)

    def run(self) -> None:
        try:
            conn, _ = self.sock.accept()
            payload = "".join(f"{i}\n" for i in self.items).encode()
            conn.sendall(payload)
            time.sleep(30)  # hold the connection while the query drains
            conn.close()
        except OSError:
            pass


@pytest.mark.timeout(120)
def test_socket_source_counts(spark, tmp_path):
    items = [7] * 30 + [13] * 15 + list(range(100, 115))
    server = _LineServer(items)
    server.start()

    stream = socket_items(spark, "127.0.0.1", server.port)
    state = SamplerState(
        n=len(items), phi=0.2, epsilon=0.05, delta=0.1, seed=1
    )
    seen: list[int] = []
    lock = threading.Lock()

    def on_batch(batch_df, _epoch):
        # socket source has no seq column: recover line-arrival order
        # (the source scatters lines round-robin across partitions —
        # a plain collect() interleaves them) and assign positions
        rows = collect_in_arrival_order(batch_df)
        with lock:
            start = len(seen)
            seen.extend(rows)
            state.update(
                list(zip(range(start + 1, start + 1 + len(rows)), rows))
            )

    query = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    deadline = time.time() + 90
    while not state.stopped and time.time() < deadline:
        time.sleep(0.3)
    query.stop()
    query.awaitTermination(30)
    server.sock.close()

    assert state.processed == len(items)
    # arrival order fully recovered — not just the multiset
    assert seen == items
    assert state.counts[7] == 30 and state.counts[13] == 15
    assert state.true_frequent() == [7, 13]
