"""KafkaDataset: streaming online-learning input.

Role of the reference's KafkaDataset / KafkaGroupIODataset
(``core/kernels/data/kafka_dataset_op.cc``, ``docs/KafkaDataset.md``):
consume training samples from Kafka topics for online learning.

Client selection: ``confluent_kafka`` (librdkafka) when installed,
otherwise the dependency-free wire-protocol client in
``kafka_protocol.py`` — so the streaming path runs end-to-end in any
environment (tests drive it against ``MiniKafkaBroker``).
``ReplayStream`` provides the same interface from a file for offline
replay.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterator, Optional, Sequence, Tuple

from deeprec_tpu.data import kafka_protocol

try:  # pragma: no cover - environment probe
    import confluent_kafka  # type: ignore

    HAVE_KAFKA = True
except ImportError:  # pragma: no cover
    confluent_kafka = None
    HAVE_KAFKA = False


class KafkaDataset:
    """Iterate messages from Kafka topics; ``parse`` maps a list of raw
    message values to one framework batch.

    Offsets are exposed via ``state()``/``restore_state()`` so an
    online-learning job can resume its stream position from a
    checkpoint (the saveable-resource pattern of the reference's
    ``work_queue.py:113``); native-client only — librdkafka manages
    group offsets broker-side.
    """

    def __init__(self, topics: Sequence[str], group_id: str,
                 bootstrap_servers: str, batch_size: int,
                 parse: Callable[[list], dict],
                 poll_timeout: float = 1.0,
                 max_batches: Optional[int] = None,
                 use_native: Optional[bool] = None):
        native = (not HAVE_KAFKA) if use_native is None else use_native
        if native:
            self._consumer = kafka_protocol.NativeKafkaConsumer(
                bootstrap_servers, client_id=group_id)
        else:  # pragma: no cover - librdkafka absent in CI env
            self._consumer = confluent_kafka.Consumer({
                "bootstrap.servers": bootstrap_servers,
                "group.id": group_id,
                "auto.offset.reset": "earliest",
            })
        self._native = native
        self._consumer.subscribe(list(topics))
        self._batch_size = batch_size
        self._parse = parse
        self._poll_timeout = poll_timeout
        self._max_batches = max_batches

    def state(self) -> Dict[str, int]:
        if not self._native:  # pragma: no cover
            raise NotImplementedError("state() requires the native client")
        return {f"{t}:{p}": off
                for (t, p), off in self._consumer.position().items()}

    def restore_state(self, state: Dict[str, int]) -> None:
        if not self._native:  # pragma: no cover
            raise NotImplementedError(
                "restore_state() requires the native client")
        for key, off in state.items():
            topic, _, part = key.rpartition(":")
            self._consumer.seek(topic, int(part), int(off))

    def close(self):
        self._consumer.close()

    def __iter__(self) -> Iterator[dict]:
        buf = []
        # (topic, partition) -> offset of the first message in ``buf``
        # from that partition.  Messages polled into a partial batch
        # were consumed from the client but never delivered to the
        # trainer; on exit the consumer is rewound to them so
        # ``state()`` (and re-iteration) does not skip records at a
        # save/resume boundary that isn't batch-aligned.
        inflight: Dict[Tuple[str, int], int] = {}
        emitted = 0
        idle = 0
        try:
            while True:
                msg = self._consumer.poll(self._poll_timeout)
                if msg is None or msg.error():
                    idle += 1
                    # Bounded iteration support: stop when drained and a
                    # batch budget was set (tests / bounded replay).
                    if self._max_batches is not None and idle >= 3:
                        return
                    continue
                idle = 0
                buf.append(msg.value())
                if self._native:
                    inflight.setdefault(
                        (msg.topic(), msg.partition()), msg.offset())
                if len(buf) == self._batch_size:
                    batch = self._parse(buf)
                    buf = []
                    inflight.clear()
                    yield batch
                    emitted += 1
                    if (self._max_batches is not None
                            and emitted >= self._max_batches):
                        return
        finally:
            if self._native:
                for (t, p), off in inflight.items():
                    self._consumer.seek(t, p, off)


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
