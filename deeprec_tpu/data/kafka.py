"""KafkaDataset: streaming online-learning input (gated).

Role of the reference's KafkaDataset / KafkaGroupIODataset
(``core/kernels/data/kafka_dataset_op.cc``, ``docs/KafkaDataset.md``):
consume training samples from Kafka topics for online learning.

This environment has no Kafka client library; the implementation is
complete against the ``confluent_kafka`` API and raises a clear error
when the dependency is absent.  ``ReplayStream`` provides the same
interface from a file for tests/offline replay.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Sequence

try:  # pragma: no cover - environment probe
    import confluent_kafka  # type: ignore

    HAVE_KAFKA = True
except ImportError:  # pragma: no cover
    confluent_kafka = None
    HAVE_KAFKA = False


class KafkaDataset:
    """Iterate messages from Kafka topics; ``parse`` maps a list of raw
    message values to one framework batch."""

    def __init__(self, topics: Sequence[str], group_id: str,
                 bootstrap_servers: str, batch_size: int,
                 parse: Callable[[list], dict],
                 poll_timeout: float = 1.0):
        if not HAVE_KAFKA:
            raise ImportError(
                "KafkaDataset requires confluent_kafka, which is not "
                "available in this environment; use ReplayStream for "
                "offline replay")
        self._consumer = confluent_kafka.Consumer({
            "bootstrap.servers": bootstrap_servers,
            "group.id": group_id,
            "auto.offset.reset": "earliest",
        })
        self._consumer.subscribe(list(topics))
        self._batch_size = batch_size
        self._parse = parse
        self._poll_timeout = poll_timeout

    def __iter__(self) -> Iterator[dict]:
        buf = []
        while True:
            msg = self._consumer.poll(self._poll_timeout)
            if msg is None or msg.error():
                continue
            buf.append(msg.value())
            if len(buf) == self._batch_size:
                yield self._parse(buf)
                buf = []


class ReplayStream:
    """File-backed stand-in with the KafkaDataset interface (one raw
    record per line), for tests and offline replay of online jobs."""

    def __init__(self, path: str, batch_size: int,
                 parse: Callable[[list], dict], loop: bool = False):
        self._path = path
        self._batch_size = batch_size
        self._parse = parse
        self._loop = loop

    def __iter__(self) -> Iterator[dict]:
        while True:
            buf = []
            with open(self._path, "rb") as f:
                for line in f:
                    buf.append(line.rstrip(b"\n"))
                    if len(buf) == self._batch_size:
                        yield self._parse(buf)
                        buf = []
            if not self._loop:
                return
