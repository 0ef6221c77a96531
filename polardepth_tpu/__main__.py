from polardepth_tpu.cli import main

raise SystemExit(main())
