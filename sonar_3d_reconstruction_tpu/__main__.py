from sonar_3d_reconstruction_tpu.cli import main

raise SystemExit(main())
