import sys
from unet_tpu.cli.main import main

sys.exit(main())
