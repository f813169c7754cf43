"""The playback main loop (≙ run_blast, runtime.rs:31-380).

Thread layout mirrors the reference: a reader thread feeds parsed-ready
command strings through the lock-free ring; the render thread drains the
ring, applies commands to the engine state, renders a block, and hands it
to the sink — drain → render → commit, the same cycle as the reference's
queue-pop → coordinate → mmap_commit (runtime.rs:320-380).  SIGTERM sets
an atomic flag the loop polls (runtime.rs:398-416); terminal state is
restored on every exit path.
"""

from __future__ import annotations

import collections
import signal
import sys
import threading

import numpy as np

from ..engine import commands as EC
from ..engine.render import render_block
from .native import CmdRing, RawTerminal, Sink

PERIOD = 128  # frames per block (≙ runtime.rs:282-284)


class EngineLoop:
    """Drives the jitted renderer against a sink, fed by a command ring."""

    def __init__(self, state, registry, sample_rate: int, channels: int,
                 sink: Sink | None = None, device: str = "default"):
        self.state = state
        self.reg = registry
        self.rate = sample_rate
        self.channels = channels
        self.proc = EC.CmdProcessor(registry, sample_rate)
        self.ring = CmdRing(256)
        self.sink = sink or Sink(device, sample_rate, channels)
        self.term = threading.Event()
        self.errors: list[str] = []
        self._pending: "collections.deque" = collections.deque()

    def submit(self, line: str) -> bool:
        """Parse + enqueue (parse errors surface immediately on the caller's
        thread, like the reference's REPL-side validation)."""
        line = line.strip()
        if not line:
            return True
        try:
            cmd = self.proc.parse(line)
        except EC.CmdErr as e:
            self.errors.append(str(e))
            return False
        if cmd.verb == "quit":
            self.term.set()
            return True
        self._pending.append(cmd)
        if not self.ring.try_push(line):
            self.errors.append("command queue full; dropped")
            self._pending.pop()
            return False
        return True

    def run_blocks(self, n_blocks: int) -> np.ndarray:
        """Render n blocks (drain → apply → render → sink per block)."""
        out = []
        for _ in range(n_blocks):
            if self.term.is_set():
                break
            while self.ring.try_pop() is not None:
                if self._pending:
                    cmd = self._pending.popleft()
                    self.state = EC.apply(self.state, self.reg, cmd)
            block, self.state = render_block(
                self.state, frames=PERIOD, out_channels=self.channels
            )
            block_np = np.asarray(block)
            self.sink.write(block_np)
            out.append(block_np)
        return (
            np.concatenate(out) if out else np.zeros((0, self.channels), np.float32)
        )

    def install_sigterm(self):
        """SIGTERM → atomic flag → clean loop exit (≙ runtime.rs:398-416).
        Must run on the main thread."""
        try:
            signal.signal(signal.SIGTERM, lambda *_: self.term.set())
        except ValueError:
            pass  # not the main thread; caller owns signal setup

    def run_forever(self):
        try:
            while not self.term.is_set():
                self.run_blocks(64)
        finally:
            self.sink.close()


def repl(loop: EngineLoop, infile=None, outfile=None):
    """Line-oriented REPL feeding the engine loop (≙ the reference's
    key-reader thread, runtime.rs:137-243, minus raw-mode line editing
    when stdin is not a tty)."""
    infile = infile or sys.stdin
    outfile = outfile or sys.stdout
    loop.install_sigterm()
    render_thread = threading.Thread(target=loop.run_forever, daemon=True)
    render_thread.start()
    try:
        with RawTerminal():
            for line in infile:
                line = line.strip()
                if not line:
                    continue
                ok = loop.submit(line)
                if not ok and loop.errors:
                    print(f"error: {loop.errors[-1]}", file=outfile)
                if loop.term.is_set():
                    break
    except KeyboardInterrupt:
        pass
    finally:
        loop.term.set()
        render_thread.join(timeout=5)
