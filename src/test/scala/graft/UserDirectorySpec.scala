package graft

import graft.cdc.{Discovery, UserRecord}
import org.scalatest.funsuite.AnyFunSuite

/** Endpoint-semantics checks for Discovery.UserDirectory — the user /
  * role / invitation family (api.py:11189 GET /users, :11973 GET /roles,
  * :12052 POST /invitations) as catalog-shaped driver state.
  */
class UserDirectorySpec extends AnyFunSuite {

  private def seeded(): Discovery.UserDirectory = {
    val d = new Discovery.UserDirectory
    (1 to 25).foreach(i => d.createUser(s"user$i@example.com", s"User $i", "user"))
    d
  }

  test("listUsers pages with offset/limit in insertion order") {
    val d = seeded()
    val page = d.listUsers(skip = 10, limit = 5)
    assert(page.map(_.email) == (11 to 15).map(i => s"user$i@example.com"))
    assert(d.listUsers(skip = 0, limit = 100).length == 25)
    assert(d.listUsers(skip = 25, limit = 10).isEmpty, "page past the end is empty")
  }

  test("createUser rejects duplicates and bad emails; getUser finds by id") {
    val d = new Discovery.UserDirectory
    val u = d.createUser("A@Example.COM", "A", "admin").toOption.get
    assert(u.email == "a@example.com", "email normalized to lowercase")
    assert(u.isSuperuser, "admin role implies superuser")
    assert(d.createUser("a@example.com", "A2", "user").isLeft, "duplicate email rejected")
    assert(d.createUser("not-an-email", "X", "user").isLeft)
    assert(d.getUser(u.id).contains(u))
    assert(d.getUser("u-999").isEmpty, "the endpoint's 404")
  }

  test("listRoles falls back to the built-in seven until a role is stored") {
    val d = new Discovery.UserDirectory
    assert(d.listRoles().map(_.name) == Seq("admin", "super_admin", "org_admin",
      "data_engineer", "operator", "viewer", "user"))
    d.addRole("custom", "Custom role")
    assert(d.listRoles().map(_.name) == Seq("custom"),
      "stored roles replace the built-in fallback entirely, as the endpoint does")
  }

  test("invitation ladder: whitelist fallback, active-user rejection, PENDING materialization") {
    val d = new Discovery.UserDirectory
    d.createUser("active@example.com", "A", "user")
    assert(d.createInvitation("active@example.com", "user", "u-0").isLeft,
      "active user cannot be re-invited")
    assert(d.createInvitation("bad-email", "user", "u-0").isLeft)
    val inv = d.createInvitation("New@Example.com", "not-a-role", "u-0").toOption.get
    assert(inv.roleName == "viewer", "unknown role falls back to viewer")
    assert(inv.status == "PENDING")
    assert(inv.expiresSeq > 0)
    val pending = d.listUsers().find(_.email == "new@example.com").get
    assert(!pending.isActive && pending.status == "PENDING")
    assert(pending.fullName == "new",
      "full name is the local part of the NORMALIZED email (the endpoint lowercases first)")
    // re-inviting a PENDING (inactive) user is allowed and does NOT duplicate the user
    val inv2 = d.createInvitation("new@example.com", "operator", "u-0").toOption.get
    assert(inv2.roleName == "operator")
    assert(d.listUsers().count(_.email == "new@example.com") == 1)
  }

  test("superuser only for admin/super_admin invitees") {
    val d = new Discovery.UserDirectory
    d.createInvitation("a@x.com", "admin", "u-0")
    d.createInvitation("b@x.com", "operator", "u-0")
    val byEmail = d.listUsers().map(u => u.email -> u).toMap
    assert(byEmail("a@x.com").isSuperuser)
    assert(!byEmail("b@x.com").isSuperuser)
  }

  test("importUsers counts imported/skipped/errors and returns tokens") {
    val d = new Discovery.UserDirectory
    d.createUser("dup@x.com", "D", "user")
    val r = d.importUsers(Seq("one@x.com", "dup@x.com", "bad", "two@x.com"), "viewer", "u-0")
    assert(r.imported == 2)
    assert(r.skippedDuplicates == 1)
    assert(r.errors.length == 1 && r.errors.head.startsWith("bad:"))
    assert(r.invitationTokens.length == 2)
    assert(r.invitationTokens.distinct.length == 2, "tokens unique")
  }

  test("listInvitations returns newest-first") {
    val d = new Discovery.UserDirectory
    (1 to 5).foreach(i => d.createInvitation(s"p$i@x.com", "viewer", "u-0"))
    val inv = d.listInvitations(limit = 3)
    assert(inv.length == 3)
    assert(inv.map(_.expiresSeq) == inv.map(_.expiresSeq).sorted.reverse)
    assert(inv.head.email == "p5@x.com")
  }

  test("acceptInvitation: the api.py:12087 branch ladder in order") {
    val d = new Discovery.UserDirectory
    val inv = d.createInvitation("new@x.com", "operator", "u-0").toOption.get
    // unknown token → the 404 detail
    assert(d.acceptInvitation("tok-nope", "Aa1!aaaa") == Left("Invalid or expired invitation token"))
    // weak passwords → each strength message, invitation still PENDING
    assert(d.acceptInvitation(inv.token, "") == Left("Password is required"))
    assert(d.acceptInvitation(inv.token, "Aa1!a") == Left("Password must be at least 8 characters long"))
    assert(d.acceptInvitation(inv.token, "aa1!aaaa") == Left("Password must contain at least one uppercase letter"))
    assert(d.acceptInvitation(inv.token, "AA1!AAAA") == Left("Password must contain at least one lowercase letter"))
    assert(d.acceptInvitation(inv.token, "Aaa!aaaa") == Left("Password must contain at least one digit"))
    assert(d.acceptInvitation(inv.token, "Aa1aaaaa").left.exists(_.startsWith("Password must contain at least one special")))
    assert(d.listInvitations().find(_.token == inv.token).get.status == "PENDING")
    // success: user activates, invitation flips to ACCEPTED
    val u = d.acceptInvitation(inv.token, "Aa1!aaaa", Some("New Name")).toOption.get
    assert(u.isActive && u.status == "ACTIVE" && u.fullName == "New Name")
    assert(d.listInvitations().find(_.token == inv.token).get.status == "ACCEPTED")
    // replay → "already used or expired"
    assert(d.acceptInvitation(inv.token, "Aa1!aaaa") == Left("Invitation already used or expired"))
  }

  test("acceptInvitation: expiry flips the invitation to EXPIRED (a state write)") {
    val d = new Discovery.UserDirectory
    val inv = d.createInvitation("late@x.com", "viewer", "u-0").toOption.get
    d.advanceSeq(8) // past the 7-unit expiry window
    assert(d.acceptInvitation(inv.token, "Aa1!aaaa") == Left("Invitation has expired"))
    assert(d.listInvitations().find(_.token == inv.token).get.status == "EXPIRED")
    // the user stays PENDING — expiry never activates anyone
    assert(d.listUsers().find(_.email == "late@x.com").exists(u => !u.isActive))
  }

  test("acceptInvitation: full-name fallback is the email's local part") {
    val d = new Discovery.UserDirectory
    val inv = d.createInvitation("fallback@x.com", "viewer", "u-0").toOption.get
    val u = d.acceptInvitation(inv.token, "Aa1!aaaa").toOption.get
    assert(u.fullName == "fallback")
  }

  test("listInvitations: newest-first with status_filter, skip and limit (api.py:12052)") {
    val d = new Discovery.UserDirectory
    val invs = (1 to 6).map(i => d.createInvitation(s"p$i@x.com", "viewer", "u-0").toOption.get)
    // redeem one so two statuses exist
    d.acceptInvitation(invs(2).token, "Aa1!aaaa")
    val all = d.listInvitations()
    assert(all.map(_.email) == (6 to 1 by -1).map(i => s"p$i@x.com"),
      "created_at DESC — newest first")
    assert(d.listInvitations(skip = 2).map(_.email) ==
      (4 to 1 by -1).map(i => s"p$i@x.com"), "skip offsets AFTER the ordering")
    assert(d.listInvitations(limit = 2, skip = 1).map(_.email) == Seq("p5@x.com", "p4@x.com"))
    val pending = d.listInvitations(statusFilter = Some("PENDING"))
    assert(pending.length == 5 && !pending.exists(_.email == "p3@x.com"),
      "exact-match status filter applies before pagination")
    assert(d.listInvitations(statusFilter = Some("ACCEPTED")).map(_.email) == Seq("p3@x.com"))
    assert(d.listInvitations(statusFilter = Some("nope")).isEmpty)
  }

  test("updateUser: 404 ladder, role whitelist REJECTS (no viewer fallback), superuser re-derived") {
    val d = new Discovery.UserDirectory
    val u = d.createUser("up@x.com", "Up", "user").toOption.get
    assert(d.updateUser("u-999", fullName = Some("X")) == Left("User not found"))
    val bad = d.updateUser(u.id, roleName = Some("not-a-role"), fullName = Some("Changed"))
    assert(bad.left.exists(_.startsWith("Invalid role. Must be one of:")),
      "update REJECTS bad roles where the invitation path silently falls back to viewer")
    assert(d.getUser(u.id).get.fullName == "Up",
      "failed validation persists NOTHING (the endpoint raises before commit)")
    val promoted = d.updateUser(u.id, roleName = Some("super_admin")).toOption.get
    assert(promoted.isSuperuser, "is_superuser re-derived from the new role")
    val demoted = d.updateUser(u.id, roleName = Some("viewer")).toOption.get
    assert(!demoted.isSuperuser)
  }

  test("updateUser: password strength ladder applies, role error wins over password error") {
    val d = new Discovery.UserDirectory
    val u = d.createUser("pw@x.com", "Pw", "user").toOption.get
    assert(d.updateUser(u.id, password = Some("short")) ==
      Left("Password must be at least 8 characters long"))
    assert(d.updateUser(u.id, roleName = Some("bogus"), password = Some("short"))
      .left.exists(_.startsWith("Invalid role")),
      "the endpoint validates role before password — its message wins")
    assert(d.updateUser(u.id, password = Some("")).isRight,
      "empty password is falsy in the endpoint — skipped, not validated")
    val deactivated = d.updateUser(u.id,
      isActive = Some(false), status = Some("SUSPENDED")).toOption.get
    assert(!deactivated.isActive && deactivated.status == "SUSPENDED")
  }

  test("deleteUser: hard delete with 404 ladder (api.py:11523)") {
    val d = new Discovery.UserDirectory
    val u = d.createUser("gone@x.com", "Gone", "user").toOption.get
    assert(d.deleteUser("u-999") == Left("User not found"))
    val removed = d.deleteUser(u.id).toOption.get
    assert(removed.email == "gone@x.com",
      "the removed record is returned — the endpoint's audit old_value")
    assert(d.getUser(u.id).isEmpty, "a HARD delete — the row is gone, not deactivated")
    assert(d.deleteUser(u.id) == Left("User not found"), "second delete hits the 404")
    assert(d.createUser("gone@x.com", "Again", "user").isRight,
      "the email is reusable after a hard delete (no tombstone)")
  }
}
