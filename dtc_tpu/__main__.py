import sys

from dtc_tpu.utils.cli import main

sys.exit(main())
