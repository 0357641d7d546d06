"""(stub — filled in incrementally)"""
