from pyrope_tpu.server.app import main

main()
