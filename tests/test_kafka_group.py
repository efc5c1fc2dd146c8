"""Consumer-group coordination over the native Kafka client
(``data/kafka_group.py`` — the KafkaGroupIODataset analog):
partition rebalance across live members, committed group offsets,
exactly-once-per-group delivery under graceful churn.
"""

import numpy as np
import pytest

from deeprec_tpu.data.kafka_group import (GroupCoordinator,
                                          KafkaGroupDataset,
                                          coordinator_for_topics)
from deeprec_tpu.data.kafka_protocol import (KafkaProtocolClient,
                                             MiniKafkaBroker)


@pytest.fixture()
def broker():
    b = MiniKafkaBroker(num_partitions=4)
    yield b
    b.shutdown()


def _produce(broker, topic, values, parts=4):
    c = KafkaProtocolClient(broker.host, broker.port)
    try:
        c.metadata([topic])  # auto-create
        for i, v in enumerate(values):
            c.produce(topic, i % parts, [(None, v)])
    finally:
        c.close()


def _parse(raw):
    return [int(v) for v in raw]


def test_assignment_rebalance_and_generation():
    coord = GroupCoordinator([("t", p) for p in range(4)],
                             session_timeout=60)
    v_a = coord.join("a")
    assert len(v_a["assigned"]) == 4      # only member owns everything
    g0 = v_a["generation"]
    v_b = coord.join("b")
    assert v_b["generation"] > g0
    v_a2 = coord.heartbeat("a")
    got_a = {tuple(tp) for tp in v_a2["assigned"]}
    got_b = {tuple(tp) for tp in v_b["assigned"]}
    assert len(got_a) == 2 and len(got_b) == 2
    assert got_a | got_b == {("t", p) for p in range(4)}
    assert not (got_a & got_b)
    coord.leave("b")
    v_a3 = coord.heartbeat("a")
    assert len(v_a3["assigned"]) == 4


def test_session_timeout_drops_dead_member():
    coord = GroupCoordinator([("t", 0), ("t", 1)], session_timeout=0.0)
    coord.join("dead")
    import time
    time.sleep(0.01)
    v = coord.join("live")     # joining expires the dead member
    assert len(v["assigned"]) == 2


def test_two_members_partition_disjoint_streams(broker):
    values = [str(i).encode() for i in range(40)]
    _produce(broker, "clicks", values)
    coord, srv = coordinator_for_topics(
        f"{broker.host}:{broker.port}", ["clicks"], session_timeout=60)
    try:
        bs = f"{broker.host}:{broker.port}"
        ep = ("127.0.0.1", srv.port)
        da = KafkaGroupDataset(["clicks"], "worker-a", bs, ep,
                               batch_size=4, parse=_parse,
                               max_batches=100)
        db = KafkaGroupDataset(["clicks"], "worker-b", bs, ep,
                               batch_size=4, parse=_parse,
                               max_batches=100)
        # Let both adopt the 2-member generation before consuming.
        da._heartbeat()
        db._heartbeat()
        assert len(da.assigned) == 2 and len(db.assigned) == 2
        seen_a = [x for batch in da for x in batch]
        seen_b = [x for batch in db for x in batch]
        assert sorted(seen_a + seen_b) == list(range(40))
        assert not (set(seen_a) & set(seen_b))
        da.close()
        db.close()
    finally:
        srv.shutdown()


def test_rebalance_resumes_from_committed_offsets(broker):
    values = [str(i).encode() for i in range(48)]
    _produce(broker, "clicks", values)
    coord, srv = coordinator_for_topics(
        f"{broker.host}:{broker.port}", ["clicks"], session_timeout=60)
    try:
        bs = f"{broker.host}:{broker.port}"
        ep = ("127.0.0.1", srv.port)
        da = KafkaGroupDataset(["clicks"], "worker-a", bs, ep,
                               batch_size=4, parse=_parse,
                               max_batches=3)
        db = KafkaGroupDataset(["clicks"], "worker-b", bs, ep,
                               batch_size=4, parse=_parse,
                               max_batches=100)
        da._heartbeat()
        db._heartbeat()
        seen_a = [x for batch in da for x in batch]   # 3 batches, commits
        assert len(seen_a) == 12
        da.close(graceful=True)                       # -> rebalance

        # b inherits a's partitions AT THE COMMITTED OFFSETS: the
        # union covers everything exactly once across the group.
        seen_b = [x for batch in db for x in batch]
        db.close()
        assert sorted(seen_a + seen_b) == list(range(48))
    finally:
        srv.shutdown()


def test_coordinator_offsets_checkpoint_roundtrip():
    coord = GroupCoordinator([("t", 0), ("t", 1)])
    coord.join("a")
    coord.commit("a", {"t:0": 7, "t:1": 3})
    st = coord.state()
    coord2 = GroupCoordinator([("t", 0), ("t", 1)])
    coord2.restore_state(st)
    v = coord2.join("a")
    assert v["offsets"] == {"t:0": 7, "t:1": 3}
