"""Genuine socket-source integration (S17-S18): a localhost TCP server
feeds lines to readStream.format('socket') driving the word-count
pipeline — the reference's socket_streaming.py end to end."""

from __future__ import annotations

import socket
import threading
import time


from data_engineering_hs_spark.streaming.pipelines import word_count


class TestSocketSource:
    def test_socket_word_count(self, spark):
        server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        server.bind(("127.0.0.1", 0))
        port = server.getsockname()[1]
        server.listen(1)
        sent = threading.Event()

        def serve():
            conn, _ = server.accept()
            conn.sendall(b"spark streams words\nwords words stream\n")
            sent.set()
            time.sleep(3)  # keep the connection open while Spark reads
            conn.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()

        lines = (
            spark.readStream.format("socket")
            .option("host", "127.0.0.1")
            .option("port", port)
            .load()
        )
        q = (
            word_count(lines)
            .writeStream.format("memory")
            .queryName("socket_wc")
            .outputMode("complete")
            .start()
        )
        try:
            assert sent.wait(timeout=10)
            deadline = time.time() + 20
            got = {}
            while time.time() < deadline:
                q.processAllAvailable()
                got = {
                    r["word"]: r["n"]
                    for r in spark.sql("SELECT * FROM socket_wc").collect()
                }
                if got.get("words") == 3:
                    break
                time.sleep(0.5)
            assert got.get("words") == 3, got
            assert got.get("spark") == 1
            assert got.get("stream") == 1
        finally:
            q.stop()
            server.close()
