"""fd-level stderr line filtering for known-benign native-log noise.

XLA's C++ layers write diagnostics straight to file descriptor 2, below
Python's ``sys.stderr`` — ``contextlib.redirect_stderr`` never sees them.
The one pattern this framework must suppress is the ``cpu_aot_loader.cc``
ERROR emitted whenever a persistent-cache CPU AOT entry is loaded: XLA's
compile-time feature string records tuning PREFERENCES
(``+prefer-no-gather``/``+prefer-no-scatter``) that runtime host detection
never lists, so the "compile machine vs host machine" comparison trips even
on the very machine that wrote the entry, and each trip dumps a ~2 KB
feature list. The multichip dryrun loads dozens of cached programs, so the
driver's bounded tail-capture window — the public record of the run — fills
with the dump and the actual ``dryrun_multichip OK`` line falls out of it
(observed: MULTICHIP_r04.json's tail is 100 % feature dump).

Benignity is proven, not assumed: compiled code that merely *avoids*
gather/scatter instructions runs on any host, real cross-host ISA
mismatches cannot reach the loader because the cache dir is keyed by host
CPU features (runtime/compile_cache.py), the dryrun's own sharded==unsharded
equality asserts check execution, and
tests/test_compile_cache.py::test_cached_executable_reload_fresh_process
loads a cached executable in a fresh subprocess and asserts identical
results with rc=0 (no SIGILL).

The filter is a dup2 pipe + pump thread: matching lines are counted and
dropped, everything else is forwarded to the original stderr immediately
(live, not buffered until exit — a hung dryrun still shows its last real
line). Scope it tightly around the compute region; it is not async-signal
safe and restores fd 2 on exit.
"""

from __future__ import annotations

import os
import re
import sys
import threading

# the one pattern filtered by default; see module docstring for the proof
# of benignity and test_compile_cache.py for the SIGILL-free reload test
BENIGN_CPU_AOT = re.compile(
    rb"cpu_aot_loader.*prefer-no-(gather|scatter)")

# shutdown sentinel written to the pipe by __exit__: a child process that
# inherited fd 2 and outlives the context holds the pipe's write end open,
# so the pump can NOT rely on EOF — the sentinel line ends it regardless
_EOF_SENTINEL = b"\x00__mfas_logfilter_eof__\x00"


def run_filtered(main, *args, **kwargs):
    """CLI ``__main__`` helper: run ``main(*args, **kwargs)`` with the
    default benign-noise filter on fd 2 (one policy for every entry
    point — see the CLIs' ``__main__`` blocks)."""
    with filter_stderr_lines():
        return main(*args, **kwargs)


class filter_stderr_lines:
    """Context manager: drop fd-2 lines matching ``pattern`` (bytes regex,
    ``re.search``), forward everything else to the real stderr unchanged.

    On exit, restores fd 2 and — when anything was dropped — writes one
    summary line so the suppression itself is on the record. ``dropped``
    holds the count after exit.
    """

    def __init__(self, pattern: re.Pattern = BENIGN_CPU_AOT,
                 summary: str | None = ("(filtered {n} known-benign "
                                        "cpu_aot_loader tuning-preference "
                                        "lines; mfas_tpu/runtime/"
                                        "logfilter.py)\n")):
        self._pattern = pattern
        self._summary = summary
        self.dropped = 0

    def __enter__(self):
        sys.stderr.flush()
        self._orig_fd = os.dup(2)          # the real stderr, kept for output
        self._read_fd, write_fd = os.pipe()
        os.dup2(write_fd, 2)               # all fd-2 writers now feed the pipe
        os.close(write_fd)
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()
        return self

    def _pump(self):
        # read raw bytes and split on \n ourselves: the pipe carries
        # interleaved C++ and Python writes, and a TextIOWrapper could
        # choke on partial UTF-8 at chunk boundaries
        buf = b""
        done = False
        while not done:
            try:
                chunk = os.read(self._read_fd, 65536)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for line in lines:
                if line.endswith(_EOF_SENTINEL):  # __exit__'s shutdown
                    done = True                   # signal; a writer's
                    line = line[:-len(_EOF_SENTINEL)]  # partial line may
                    if not line:                  # be glued to its front
                        continue
                self._emit(line + b"\n")
        if buf:                            # partial last line: never drop it
            self._emit(buf)

    def _emit(self, line: bytes):
        if self._pattern.search(line):
            self.dropped += 1
            return
        try:
            os.write(self._orig_fd, line)
        except OSError:
            pass                           # real stderr closed: nothing to do

    def __exit__(self, *exc):
        sys.stderr.flush()
        # a shutdown sentinel BEFORE restoring fd 2: re-pointing fd 2 only
        # EOFs the pipe when we are its last writer — a child spawned in
        # the filtered region that inherited fd 2 and is still alive keeps
        # the write end open, and the pump would block in os.read forever.
        # The sentinel line ends it either way.
        try:
            os.write(2, _EOF_SENTINEL + b"\n")
        except OSError:
            pass
        os.dup2(self._orig_fd, 2)
        self._thread.join(timeout=10)
        if self._thread.is_alive():
            # pump still blocked (sentinel lost?): LEAK the read fd rather
            # than close it under a live reader — a closed-then-recycled fd
            # number would make the daemon thread steal bytes from whatever
            # file reuses it
            pass
        else:
            os.close(self._read_fd)
        if self.dropped and self._summary:
            try:
                os.write(self._orig_fd,
                         self._summary.format(n=self.dropped).encode())
            except OSError:
                pass
        os.close(self._orig_fd)
        return False
