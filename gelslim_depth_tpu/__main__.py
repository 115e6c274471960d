import sys

from gelslim_depth_tpu.cli import main

sys.exit(main())
