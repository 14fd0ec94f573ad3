"""Contract bytecode analysis — D4 sighash extraction + D5 ERC classification.

Reference: ``EthContractService.get_function_sighashes``
(/root/reference/ethereumetl/service/eth_contract_service.py:29-43) walks the
first basic block of the EVM bytecode and collects PUSH4 operands;
``is_erc20_contract``/``is_erc721_contract`` (:47-70) check sighash-set
membership of the canonical interface selectors.

The disassembly is a pure function of the bytecode string → an Arrow-batched
pandas UDF (one pass, no external EVM lib: PUSH opcodes 0x60-0x7f carry
1-32 immediate bytes; basic block ends at the first terminator/jump like the
reference's evmdasm-based scan). Classification is plain ``array_contains``
conjunctions — JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical selectors (first 4 bytes of keccak of the function signature —
# public constants of the ERC standards, cf. eth_contract_service.py:47-95)
ERC20_SELECTORS = ["0x18160ddd", "0x70a08231", "0xa9059cbb", "0xdd62ed3e", "0x095ea7b3", "0x23b872dd"]
ERC20_REQUIRED = ["0x18160ddd", "0x70a08231", "0xa9059cbb"]  # totalSupply, balanceOf, transfer
ERC721_SELECTORS = ["0x6352211e", "0x70a08231", "0xa9059cbb", "0x095ea7b3", "0x23b872dd"]
ERC721_REQUIRED = ["0x6352211e", "0x70a08231"]  # ownerOf, balanceOf

_TERMINATORS = {0x00, 0xF3, 0xFD, 0xFE, 0xFF, 0x56, 0x57}  # STOP RETURN REVERT INVALID SELFDESTRUCT JUMP JUMPI


def _sighashes_one(bytecode: str | None) -> list[str] | None:
    if not bytecode or bytecode in ("0x", "0X"):
        return None
    h = bytecode[2:] if bytecode.startswith(("0x", "0X")) else bytecode
    try:
        code = bytes.fromhex(h)
    except ValueError:
        return None
    out: set[str] = set()
    i = 0
    while i < len(code):
        op = code[i]
        if 0x60 <= op <= 0x7F:  # PUSH1..PUSH32
            width = op - 0x5F
            if op == 0x63 and i + 4 < len(code):  # PUSH4 — selector candidate
                out.add("0x" + code[i + 1 : i + 5].hex())
            i += 1 + width
        else:
            if op in _TERMINATORS:
                break  # first basic block only (eth_contract_service.py:33-38)
            i += 1
    return sorted(out)


@F.pandas_udf(T.ArrayType(T.StringType()))
def function_sighashes(bytecode: pd.Series) -> pd.Series:
    """bytecode hex → sorted distinct 0x-sighashes from the dispatch block."""
    return bytecode.map(_sighashes_one)


def _implements(sighashes: Column, selectors: list[str]) -> Column:
    cond = F.lit(True)
    for s in selectors:
        cond = cond & F.array_contains(sighashes, s)
    return cond


def classify_contracts(contracts: DataFrame, bytecode_col: str = "bytecode") -> DataFrame:
    """contracts(+bytecode) → + function_sighashes, is_erc20, is_erc721."""
    df = contracts.withColumn("function_sighashes", function_sighashes(F.col(bytecode_col)))
    sig = F.coalesce(F.col("function_sighashes"), F.array().cast("array<string>"))
    return df.withColumn("is_erc20", _implements(sig, ERC20_REQUIRED)).withColumn(
        "is_erc721", _implements(sig, ERC721_REQUIRED) & ~_implements(sig, ["0x18160ddd"])
    )
