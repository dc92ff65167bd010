from webgraph_tpu.cli import main

main()
