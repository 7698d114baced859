from declip_tpu.solver import main

main()
