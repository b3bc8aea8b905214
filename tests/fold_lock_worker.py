"""Child process for the cross-process fold-lock drill: acquire the fold
lock, stage a live fold's mid-flight state (complete target + PENDING
marker), hold until the parent signals, then finish the fold protocol —
exactly the window where a loader's recovery used to destroy the
generation (ADVICE r7 high)."""

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
    shutil.copytree(
        os.path.join(root, "batch=0"), os.path.join(root, "batch=-1")
    )
    with open(os.path.join(root, "_FOLD_PENDING"), "w") as fh:
        fh.write(payload)
    print("HELD", flush=True)
    sys.stdin.readline()  # parent has probed recovery — finish the fold
    with open(os.path.join(root, "_FOLD_COMMITTED"), "w") as fh:
        fh.write(payload)
    shutil.rmtree(os.path.join(root, "batch=0"))
    os.remove(os.path.join(root, "_FOLD_PENDING"))
    os.remove(os.path.join(root, "_FOLD_COMMITTED"))
    os.close(fd)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
