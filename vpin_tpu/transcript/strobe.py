"""STROBE-128 (the merlin subset): AD / meta-AD / PRF / KEY over
Keccak-f[1600].  Bit-compatible with merlin's strobe.rs so transcript
challenges match the reference prover/verifier byte-for-byte."""

from __future__ import annotations

import ctypes

from .keccak import keccak_f1600
from . import _native

FLAG_I = 1
FLAG_A = 1 << 1
FLAG_C = 1 << 2
FLAG_T = 1 << 3
FLAG_M = 1 << 4
FLAG_K = 1 << 5

_R = 166  # STROBE-128 rate over keccak-f[1600] (168 minus 2 reserved bytes)


class Strobe128:
    """STROBE-128; inner byte loops run in the native C core when the
    toolchain is available (native/keccak.c), else pure Python."""

    def __init__(self, protocol_label: bytes):
        st = bytearray(200)
        st[0:6] = bytes([1, _R + 2, 1, 0, 1, 96])
        st[6:18] = b"STROBEv1.0.2"
        self._lib = _native.load()
        if self._lib is not None:
            self._posbuf = (ctypes.c_int32 * 2)(0, 0)
            self._stview = (ctypes.c_ubyte * 200).from_buffer(st)
            self._lib.keccak_f1600(self._stview)
        else:
            keccak_f1600(st)
        self.state = st
        self.pos = 0
        self.pos_begin = 0
        self.cur_flags = 0
        self.meta_ad(protocol_label, False)

    # -- native dispatch ------------------------------------------------

    def _sync_to_native(self):
        self._posbuf[0] = self.pos
        self._posbuf[1] = self.pos_begin

    def _sync_from_native(self):
        self.pos = self._posbuf[0]
        self.pos_begin = self._posbuf[1]

    # -- internals -----------------------------------------------------

    def _run_f(self) -> None:
        if self._lib is not None:
            self._sync_to_native()
            self._lib.strobe_run_f(self._stview, self._posbuf)
            self._sync_from_native()
            return
        self.state[self.pos] ^= self.pos_begin
        self.state[self.pos + 1] ^= 0x04
        self.state[_R + 1] ^= 0x80
        keccak_f1600(self.state)
        self.pos = 0
        self.pos_begin = 0

    def _absorb(self, data: bytes) -> None:
        if self._lib is not None:
            self._sync_to_native()
            buf = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
            self._lib.strobe_absorb(self._stview, self._posbuf, buf, len(data))
            self._sync_from_native()
            return
        for byte in data:
            self.state[self.pos] ^= byte
            self.pos += 1
            if self.pos == _R:
                self._run_f()

    def _overwrite(self, data: bytes) -> None:
        if self._lib is not None:
            self._sync_to_native()
            buf = (ctypes.c_ubyte * len(data)).from_buffer_copy(data)
            self._lib.strobe_overwrite(self._stview, self._posbuf, buf, len(data))
            self._sync_from_native()
            return
        for byte in data:
            self.state[self.pos] = byte
            self.pos += 1
            if self.pos == _R:
                self._run_f()

    def _squeeze(self, n: int) -> bytes:
        if self._lib is not None:
            self._sync_to_native()
            out = (ctypes.c_ubyte * n)()
            self._lib.strobe_squeeze(self._stview, self._posbuf, out, n)
            self._sync_from_native()
            return bytes(out)
        out = bytearray(n)
        for i in range(n):
            out[i] = self.state[self.pos]
            self.state[self.pos] = 0
            self.pos += 1
            if self.pos == _R:
                self._run_f()
        return bytes(out)

    def _begin_op(self, flags: int, more: bool) -> None:
        if more:
            assert self.cur_flags == flags, "cannot continue with different flags"
            return
        assert flags & FLAG_T == 0, "transport not implemented"
        old_begin = self.pos_begin
        self.pos_begin = self.pos + 1
        self.cur_flags = flags
        self._absorb(bytes([old_begin, flags]))
        force_f = (flags & (FLAG_C | FLAG_K)) != 0
        if force_f and self.pos != 0:
            self._run_f()

    # -- checkpoint support ---------------------------------------------

    def snapshot(self) -> tuple:
        """Serializable sponge state (drives intra-proof checkpointing)."""
        return (bytes(self.state), self.pos, self.pos_begin, self.cur_flags)

    def restore(self, snap: tuple) -> None:
        state, pos, pos_begin, cur_flags = snap
        # write in place: the ctypes view (_stview) aliases self.state
        self.state[:] = state
        self.pos = pos
        self.pos_begin = pos_begin
        self.cur_flags = cur_flags

    # -- public ops (merlin subset) -------------------------------------

    def meta_ad(self, data: bytes, more: bool) -> None:
        self._begin_op(FLAG_M | FLAG_A, more)
        self._absorb(data)

    def ad(self, data: bytes, more: bool) -> None:
        self._begin_op(FLAG_A, more)
        self._absorb(data)

    def prf(self, n: int, more: bool) -> bytes:
        self._begin_op(FLAG_I | FLAG_A | FLAG_C, more)
        return self._squeeze(n)

    def key(self, data: bytes, more: bool) -> None:
        self._begin_op(FLAG_A | FLAG_C, more)
        self._overwrite(data)
