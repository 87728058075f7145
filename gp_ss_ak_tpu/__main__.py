import sys

from gp_ss_ak_tpu.cli import main

sys.exit(main())
