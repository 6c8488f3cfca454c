import time

from mopoe_mimic_tpu.utils.profiling import StepTimer, annotate, device_memory_stats


def test_step_timer_excludes_warmup():
    t = StepTimer(warmup=2)
    for _ in range(2):
        t.tick(10)
    assert t.samples_per_sec == 0.0
    time.sleep(0.05)
    t.tick(10)
    assert t.samples_per_sec > 0


def test_annotate_and_memstats_do_not_crash():
    with annotate("unit-test-region"):
        pass
    stats = device_memory_stats()
    assert isinstance(stats, dict)
