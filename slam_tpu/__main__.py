from slam_tpu.cli import main

raise SystemExit(main())
