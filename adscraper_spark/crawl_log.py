"""Per-crawl log-file sink — the reference's ``util/log.ts`` analog.

The reference opens an append stream at
``<outputDir>/logs[/job_<jobId>]/<crawlName>.txt``
(log.ts:33-51 ``setLogDirFromFlags``) and writes lines formatted
``[LEVEL ts] message`` with the stack trace on following lines
(log.ts:138-140 ``formatLog``). ERROR/WARNING/INFO always reach the
file; DEBUG/VERBOSE are emitted only when the configured level admits
them (log.ts:53-129 — the gate wraps both the console print and the
file write for those two levels only).

This analog is DRIVER-side operational logging only: per-URL events
that the reference logs from each worker process surface here through
the distributed ``results``/``requests`` tables instead (the scalable
path at a 1000-executor crawl — a shared log file would serialize the
fleet). Timestamps are wall-clock by design, like the reference; the
deterministic-timestamp rule (SURVEY X4) applies to data tables, not
operator logs.
"""

from __future__ import annotations

import datetime
import os
import traceback

LEVELS = {"ERROR": 1, "WARNING": 2, "INFO": 3, "DEBUG": 4, "VERBOSE": 5}


class CrawlLog:
    """Append-mode per-crawl log file (log.ts LOG_FILE_STREAM analog).

    ``workdir`` plays the reference's ``outputDir``; the file lands at
    ``<workdir>/logs[/job_<job_id>]/<crawl_name>.txt`` — the same
    directory scheme as log.ts:40-46, so a user tailing the
    reference's layout finds ours in the same place.
    """

    def __init__(self, workdir: str, crawl_name: str = "crawl",
                 job_id: int | str | None = None, level: str = "INFO",
                 echo: bool = False):
        level = level.upper()
        if level not in LEVELS:
            raise ValueError(f"unknown log level {level!r}; "
                             f"one of {sorted(LEVELS)}")
        self.level = LEVELS[level]
        self.echo = echo
        segments = [workdir, "logs"]
        if job_id is not None:
            segments.append(f"job_{job_id}")
        log_dir = os.path.join(*segments)
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{crawl_name}.txt")
        self._fh = open(self.path, "a", buffering=1)  # line-buffered

    # -- formatting (log.ts:138-140) -----------------------------------
    @staticmethod
    def _format(level: str, message: str, stack: str | None = None) -> str:
        ts = datetime.datetime.now().astimezone().isoformat(
            timespec="seconds")
        return f"[{level} {ts}] {message}" + (f"\n{stack}" if stack else "")

    def _emit(self, level: str, message: str,
              stack: str | None = None) -> None:
        line = self._format(level, message, stack)
        self._fh.write(line + "\n")
        if self.echo:
            print(line)

    # -- level methods (log.ts:53-129) ----------------------------------
    def error(self, message: str, exc: BaseException | None = None) -> None:
        """log.ts ``error(e, url?)`` + ``strError`` collapsed: pass
        ``exc`` to append its traceback like the reference's
        ``e.stack``."""
        stack = None
        if exc is not None:
            stack = "".join(traceback.format_exception(exc)).rstrip()
        self._emit("ERROR", message, stack)

    def warning(self, message: str) -> None:
        self._emit("WARNING", message)

    def info(self, message: str) -> None:
        self._emit("INFO", message)

    def debug(self, message: str) -> None:
        if self.level >= LEVELS["DEBUG"]:
            self._emit("DEBUG", message)

    def verbose(self, message: str) -> None:
        if self.level >= LEVELS["VERBOSE"]:
            self._emit("VERBOSE", message)

    def close(self) -> None:
        try:
            self._fh.close()
        except OSError:
            pass

    def __enter__(self) -> "CrawlLog":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class NullCrawlLog:
    """No-op sink: the reference writes no log files unless
    ``setLogDirFromFlags`` was called (log.ts:132-136 guards every
    write on LOG_FILE_STREAM) — library users who never asked for a
    log file get exactly that."""

    path = None

    def error(self, message: str, exc: BaseException | None = None) -> None:
        pass

    def warning(self, message: str) -> None:
        pass

    def info(self, message: str) -> None:
        pass

    def debug(self, message: str) -> None:
        pass

    def verbose(self, message: str) -> None:
        pass

    def close(self) -> None:
        pass
