"""``python -m protoclip_tpu`` — the experiment runner (``cli/main.py``),
same entry the reference exposes as ``python main.py`` (ref ``main.py:475``).
Other entries: ``-m protoclip_tpu.cli.{extract,export,serve,ood,tsne,transcribe,ros_node}``."""

from protoclip_tpu.cli.main import main

if __name__ == "__main__":
    main()
