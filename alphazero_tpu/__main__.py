from alphazero_tpu.cli import main

main()
