from vangan_tpu.cli import main

main()
