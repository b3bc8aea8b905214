"""Child process for the cross-process recovery-vs-loader drill: act as
a RECOVERY holder mid-destructive-work — acquire the fold lock, stage a
crashed fold's state (PENDING marker + partial target) and the
``_FOLD_RECOVERING`` hint, hold until the parent signals, then finish the
rollback protocol and release. This is the window where a second loader
used to skip the held lock and read a partially-deleted target next to
intact sources (ADVICE r8 low)."""

import fcntl
import json
import os
import shutil
import sys


def main() -> None:
    root = sys.argv[1]
    fd = os.open(os.path.join(root, "_FOLD_LOCK"), os.O_CREAT | os.O_RDWR)
    fcntl.flock(fd, fcntl.LOCK_EX)
    payload = json.dumps({"target": "batch=-1", "sources": ["batch=0"]})
    with open(os.path.join(root, "_FOLD_PENDING"), "w") as fh:
        fh.write(payload)
    with open(os.path.join(root, "_FOLD_RECOVERING"), "w") as fh:
        fh.write("recovery in progress\n")
    print("HELD", flush=True)
    sys.stdin.readline()  # parent has probed the waiting loader — finish
    # rollback protocol: partial target out, then markers, then the hint
    shutil.rmtree(os.path.join(root, "batch=-1"), ignore_errors=True)
    os.remove(os.path.join(root, "_FOLD_PENDING"))
    os.remove(os.path.join(root, "_FOLD_RECOVERING"))
    os.close(fd)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
