import sys

from sigdigger_tpu.cli import main

sys.exit(main())
