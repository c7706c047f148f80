"""Request-log journaling + deterministic replay (SURVEY.md section 5
failure-recovery row: engine warm-starts from its checkpoint, unacknowledged
requests are replayed from the journal and reproduce the original outputs)."""

import numpy as np

from quantized_tpu.engine.batching import ContinuousBatcher, RequestLog, replay_request_log


def _executor(batch):
    # deterministic per-row function: replay must reproduce it exactly
    return batch.reshape(batch.shape[0], -1) @ np.linspace(
        -1, 1, batch[0].size, dtype=np.float32
    ).reshape(-1, 1)


def test_journal_and_replay_reproduce_outputs(rng, tmp_path):
    log = str(tmp_path / "requests")
    shape = (8, 8, 3)
    b1 = ContinuousBatcher(_executor, shape, batch_sizes=(4,), request_log=log).start()
    images = [rng.standard_normal(shape).astype(np.float32) for _ in range(10)]
    originals = [b1.submit(im).result(timeout=10) for im in images]
    b1.stop()  # "crash": server goes away; journal survives on disk

    # recovery: fresh batcher (warm-started weights = same executor), replay
    b2 = ContinuousBatcher(_executor, shape, batch_sizes=(4,)).start()
    futures = replay_request_log(log, b2)
    assert sorted(futures) == list(range(1, 11))
    for rid, fut in sorted(futures.items()):
        np.testing.assert_array_equal(fut.result(timeout=10), originals[rid - 1])
    b2.stop()


def test_journal_tolerates_truncated_tail(rng, tmp_path):
    log = str(tmp_path / "requests")
    shape = (4, 4, 1)
    rl = RequestLog(log)
    imgs = [rng.standard_normal(shape).astype(np.float32) for _ in range(3)]
    for i, im in enumerate(imgs, 1):
        rl.append(i, im)
    rl.close()
    # simulate a crash mid-append: truncate the payload sidecar
    with open(log + ".bin", "r+b") as f:
        f.truncate(f.seek(0, 2) - 10)
    entries = list(RequestLog.read(log))
    assert [rid for rid, _ in entries] == [1, 2]
    for (_, got), want in zip(entries, imgs):
        np.testing.assert_array_equal(got, want)
