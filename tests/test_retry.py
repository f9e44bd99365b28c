"""Transient-relay retry (utils/retry.py): transport errors retry with
backoff, everything else re-raises immediately, retries are bounded."""

import pytest

from law_of_vision_representation_in_mllms_tpu.utils.retry import (
    is_transient_relay_error, retry_transient)


def test_transient_error_retries_then_succeeds():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError(
                "UNAVAILABLE: http://127.0.0.1:8093/remote_compile: "
                "transport: Network Error: Broken pipe (os error 32)")
        return 42

    assert retry_transient(flaky, delays=(0.01,)) == 42
    assert len(calls) == 3


def test_non_transient_raises_immediately():
    calls = []

    def broken():
        calls.append(1)
        raise ValueError("shape mismatch [2,3] vs [3,2]")

    with pytest.raises(ValueError):
        retry_transient(broken, delays=(0.01,))
    assert len(calls) == 1


def test_retries_bounded():
    calls = []

    def always_down():
        calls.append(1)
        raise RuntimeError("transport: Broken pipe")

    with pytest.raises(RuntimeError):
        retry_transient(always_down, retries=2, delays=(0.01,))
    assert len(calls) == 3          # 1 + 2 retries


def test_classifier():
    assert is_transient_relay_error(RuntimeError("x remote_compile y"))
    assert not is_transient_relay_error(ValueError("NaN loss"))
