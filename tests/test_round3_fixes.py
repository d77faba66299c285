"""Round-3 advisor fixes (ADVICE.md round 2)."""

from phylign_tpu.pipeline.scheduler import _is_oom


class _FakeXlaRuntimeError(Exception):
    pass


# _is_oom matches XLA RESOURCE_EXHAUSTED by type NAME (jaxlib's class isn't
# importable on every build), so give the fake the real name
_FakeXlaRuntimeError.__name__ = "XlaRuntimeError"


class TestIsOomChainWalk:
    def test_wrapped_xla_oom_via_cause_is_detected(self):
        """A genuine XLA OOM wrapped by pipeline code (visible only through
        __cause__) must still trigger the retry-with-doubled-RAM path."""
        inner = _FakeXlaRuntimeError("RESOURCE_EXHAUSTED: failed to allocate")
        try:
            try:
                raise inner
            except _FakeXlaRuntimeError as e:
                raise RuntimeError("match stage failed for batch x") from e
        except RuntimeError as outer:
            assert _is_oom(outer)

    def test_wrapped_memoryerror_via_context_is_detected(self):
        try:
            try:
                raise MemoryError()
            except MemoryError:
                raise RuntimeError("while decompressing index")  # implicit ctx
        except RuntimeError as outer:
            assert _is_oom(outer)

    def test_grpc_quota_resource_exhausted_not_retried(self):
        """A non-XLA error merely quoting RESOURCE_EXHAUSTED (e.g. a remote
        quota error through the download path) must NOT retry with doubled
        RAM — it is not an allocation failure."""
        err = RuntimeError("RESOURCE_EXHAUSTED: rate quota exceeded for host")
        assert not _is_oom(err)

    def test_xla_resource_exhausted_direct(self):
        assert _is_oom(_FakeXlaRuntimeError("RESOURCE_EXHAUSTED: oom"))

    def test_generic_out_of_memory_message_still_matches(self):
        # lzma/native allocators raise plain exceptions with memory wording
        assert _is_oom(RuntimeError("Cannot allocate memory"))
        assert _is_oom(RuntimeError("Out of memory while allocating 1GB"))

    def test_plain_error_not_oom(self):
        assert not _is_oom(ValueError("bad input"))

    def test_cycle_in_chain_terminates(self):
        a = RuntimeError("a")
        b = RuntimeError("b")
        a.__cause__ = b
        b.__cause__ = a
        assert not _is_oom(a)
