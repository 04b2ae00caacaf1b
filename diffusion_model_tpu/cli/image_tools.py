"""CLI: image tools (tile/video/video2) — thin wrapper over
tools.image_tools (subcommand parity with /root/reference/image_tools.py)."""
from ..tools.image_tools import main

if __name__ == "__main__":
    main()
